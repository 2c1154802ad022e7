"""TP x continuous batching: the driver-gate check as a pytest
(__graft_entry__.slot_engine_mesh_check) — slot engine on a (1x4)
tensor-parallel mesh token-identical to single-device, incl. chunked
prefill and pre-admission cancellation (VERDICT r3 #6)."""

import pytest


@pytest.mark.slow
def test_slot_engine_tp_mesh_token_identical():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.slot_engine_mesh_check(4)
