"""Single-shot inference entry (eval/run_inference.py)."""

import numpy as np
import jax
from PIL import Image

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.eval.run_inference import run
from modelcompose_tpu.models.model import MultimodalLM
from tests.fake_tokenizer import FakeLlamaTokenizer


def test_run_inference_image(tmp_path, capsys):
    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    img = tmp_path / "x.png"
    Image.fromarray((np.random.RandomState(0).rand(30, 30, 3) * 255)
                    .astype(np.uint8)).save(img)

    class Args:
        model_path = "m-multimodal"
        model_base = "b"
        query = "what is this?"
        conv_mode = "vicuna_v1"
        image_file = str(img)
        audio_file = None
        video_file = None
        point_file = None
        temperature = 0.0
        max_new_tokens = 4

    tok = FakeLlamaTokenizer()
    text = run(Args, loaded=(tok, model, model.modal_processors(), 2048))
    assert isinstance(text, str) and len(text) > 0


def test_model_vqa_jsonl_flow(tmp_path):
    import json
    from modelcompose_tpu.eval.model_vqa import eval_model

    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((np.random.RandomState(0).rand(30, 30, 3) * 255)
                    .astype(np.uint8)).save(img_dir / "a.png")
    qfile = tmp_path / "q.jsonl"
    qfile.write_text(
        json.dumps({"question_id": 7, "image": "a.png",
                    "text": "what is it"}) + "\n" +
        json.dumps({"question_id": 8, "text": "plain text question"}) + "\n")

    class Args:
        model_path = "m-multimodal"
        model_base = "b"
        question_file = str(qfile)
        image_folder = str(img_dir)
        answers_file = str(tmp_path / "ans.jsonl")
        conv_mode = "vicuna_v1"
        num_chunks = 1
        chunk_idx = 0
        temperature = 0.0
        max_new_tokens = 4

    tok = FakeLlamaTokenizer()
    eval_model(Args, loaded=(tok, model, model.modal_processors(), 2048))
    lines = [json.loads(l) for l in open(Args.answers_file)]
    assert [l["question_id"] for l in lines] == [7, 8]
    assert all("text" in l for l in lines)
