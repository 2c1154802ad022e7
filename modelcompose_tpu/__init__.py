"""modelcompose-tpu: TPU-native multimodal model composition (JAX/Pallas).

Public API:
    from modelcompose_tpu import ModelConfig, MultimodalLM
    from modelcompose_tpu.models.loader import load_pretrained_model
    from modelcompose_tpu.compose.merge import merge_checkpoints
"""

from .config import ModelConfig, tiny_test_config  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):  # lazy: importing the package shouldn't pull jax paths
    if name == "MultimodalLM":
        from .models.model import MultimodalLM
        return MultimodalLM
    if name == "load_pretrained_model":
        from .models.loader import load_pretrained_model
        return load_pretrained_model
    raise AttributeError(name)
