"""Multi-PROCESS distributed test: two OS processes join one jax
distributed runtime over localhost (the role the reference's deepspeed
launcher + NCCL init plays, reference:
scripts/model_composition/train/run_finetune_vision_damc.sh:27), build a
global mesh spanning both, and run a cross-process psum.

Exercises parallel/distributed.py (initialize / is_primary /
local_batch_slice) beyond the single-process multi-device coverage."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
idx, port = int(sys.argv[1]), sys.argv[2]
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from modelcompose_tpu.parallel import distributed
from modelcompose_tpu.parallel.mesh import make_mesh

distributed.initialize(f"localhost:{port}", num_processes=2, process_id=idx)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2
assert distributed.is_primary() == (idx == 0)

sl = distributed.local_batch_slice(8)
assert (sl.start, sl.stop) == (4 * idx, 4 * idx + 4), sl

mesh = make_mesh(data=4, model=1)
local = np.arange(8, dtype=np.float32)[sl]
garr = multihost_utils.host_local_array_to_global_array(local, mesh,
                                                        P("data"))
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(garr)
val = float(np.asarray(total.addressable_data(0)))
assert val == 28.0, val
print(f"DIST OK {idx}", flush=True)
"""


def test_two_process_mesh_and_collective():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, "-c", _CHILD, str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"DIST OK {i}" in out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
