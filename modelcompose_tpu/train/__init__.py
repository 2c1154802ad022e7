from .trainer import (TrainConfig, TrainState, init_train_state,  # noqa: F401
                      make_optimizer, make_train_step)
