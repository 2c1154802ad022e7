"""Multi-host initialization.

The reference's multi-process story is the deepspeed/NCCL launcher
(reference: scripts/model_composition/train/run_finetune_vision_damc.sh:27,
SURVEY.md §2.10); the TPU equivalent is ``jax.distributed.initialize`` —
after which ``jax.devices()`` spans all hosts and the same GSPMD
mesh/sharding code runs unchanged, with XLA routing collectives over ICI
within a slice and DCN across slices.

Usage (one call per host, before any other jax API):

    from modelcompose_tpu.parallel import distributed
    distributed.initialize()            # TPU pods: discovers peers itself
    mesh = make_mesh(data=jax.device_count() // 4, model=4)
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host jax.  On TPU pods all arguments are discovered
    from the environment; on CPU/GPU test rigs pass them explicitly."""
    import jax
    # Pass each argument independently: num_processes/process_id must not
    # be silently dropped just because coordinator_address is env-provided.
    kwargs = {k: v for k, v in dict(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id).items() if v is not None}
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on process 0 (checkpoint writes, logging)."""
    import jax
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous shard of a globally-sharded batch."""
    import jax
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
