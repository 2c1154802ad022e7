from .model import MultimodalLM, causal_lm_loss  # noqa: F401
from .projectors import apply_projector, init_projector  # noqa: F401
