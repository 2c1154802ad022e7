"""Mesh-sharded decode: pytest twin of __graft_entry__.decode_mesh_check.

The production serving configuration is a TP-sharded model answering
batch-1..N generation requests (reference decode loop: modelcompose/eval/
model_multimodal_qa_loader.py:93-102).  The driver dryrun validates the
same property out-of-process; this test keeps it in the suite on the
conftest-provisioned 8-device virtual CPU mesh.
"""

import pytest
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


@pytest.mark.slow
def test_decode_mesh_invariant():
    __graft_entry__.decode_mesh_check(8)
