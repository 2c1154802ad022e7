from .generate import generate  # noqa: F401
from .llama import KVCache, forward, init_params  # noqa: F401
from .packing import assemble_embeds, plan_pack  # noqa: F401
