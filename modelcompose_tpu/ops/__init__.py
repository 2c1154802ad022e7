from .attention import attention, attention_reference, decode_attention  # noqa: F401
from .flash_attention import flash_attention  # noqa: F401
from .norms import rms_norm  # noqa: F401
from .quant import quantize_backbone, quantize_int8  # noqa: F401
from .rope import apply_rope, rope_tables  # noqa: F401
from .routed_lora import routed_lora_matmul  # noqa: F401
