from .merge import merge_checkpoints  # noqa: F401
from .ties import do_merging  # noqa: F401
