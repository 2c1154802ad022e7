"""Retrieval-by-LM-scoring eval (eval/retrieval.py)."""

import json

import numpy as np
import pytest
from PIL import Image

from modelcompose_tpu.eval.retrieval import (eval_retrieval, recall_metrics)
from tests.fake_tokenizer import FakeLlamaTokenizer


def test_recall_metrics():
    m = recall_metrics([0, 0, 4, 12])
    assert m["R@1"] == 50.0
    assert m["R@5"] == 75.0
    assert m["R@10"] == 75.0
    assert m["MedR"] == 3.0


@pytest.mark.slow
def test_eval_retrieval_flow(tmp_path):
    import jax
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM

    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))

    img = tmp_path / "img.png"
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                    .astype(np.uint8)).save(img)
    records = [{"id": 0,
                "conversations": [
                    {"from": "human", "value": "<image>\ndescribe"}],
                "modal_inputs": {"vision": [str(img)]},
                "candidates": ["a red ball", "blue sky day",
                               "cat and dog"],
                "gold": 1}]
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps(records))

    class Args:
        model_path = "x-multimodal"
        model_base = "b"
        question_file = str(qfile)
        conv_mode = "vicuna_v1"

    tok = FakeLlamaTokenizer()
    metrics = eval_retrieval(
        Args, loaded=(tok, model, model.modal_processors(), 2048))
    assert set(metrics) == {"R@1", "R@5", "R@10", "MedR"}
    assert 0 <= metrics["R@1"] <= 100
