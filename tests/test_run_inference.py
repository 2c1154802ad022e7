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
