"""End-to-end tiny vision-only model: image -> processor -> packing ->
routed backbone -> greedy decode / loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
from modelcompose_tpu.models.model import MultimodalLM, causal_lm_loss

IMG = MODAL_TOKEN_INDEXES["vision"]


@pytest.fixture(scope="module")
def tiny_vision_model():
    cfg = tiny_test_config(
        mm_vision_encoder="test:32x2", mm_hidden_size=32,
        mm_projector_type="mlp2x_gelu", local_prefix_tokens=2,
        local_suffix_tokens=2)
    return MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))


def test_feature_span_len(tiny_vision_model):
    # 28/14=2 -> 4 patches + 2 prefix + 2 suffix
    assert tiny_vision_model.feature_span_len("vision") == 8


def test_image_generate(tiny_vision_model):
    model = tiny_vision_model
    proc = model.modal_processors()["vision"]
    img = Image.fromarray(
        (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8))
    pixels = proc([img, img])
    ids0 = np.array([1, 5, IMG, 9, 10])
    ids1 = np.array([1, IMG, 7])
    out = model.generate([ids0, ids1], {"vision": pixels},
                         max_new_tokens=4, bucket_len=32)
    assert len(out) == 2 and all(0 < len(o) <= 4 for o in out)
    # determinism
    out2 = model.generate([ids0, ids1], {"vision": pixels},
                          max_new_tokens=4, bucket_len=32)
    assert out == out2


@pytest.mark.slow
def test_loss_and_grads_flow_to_projector_not_encoder(tiny_vision_model):
    model = tiny_vision_model
    pixels = np.random.RandomState(1).rand(1, 28, 28, 3).astype(np.float32)
    ids = np.array([1, IMG, 9, 10])
    labels = np.array([-100, -100, 9, 10])

    def loss_fn(proj, enc_params):
        m = MultimodalLM(model.cfg, model.params, model.encoders, proj)
        # monkey-patch encoder params functionally
        old = model.encoders["vision"].params
        model.encoders["vision"].params = enc_params
        try:
            return m.loss([ids], [labels], {"vision": pixels}, bucket_len=16)
        finally:
            model.encoders["vision"].params = old

    loss, grads = jax.value_and_grad(loss_fn)(
        model.projectors, model.encoders["vision"].params)
    assert np.isfinite(float(loss))
    g_norm = sum(float(jnp.abs(g).sum())
                 for g in jax.tree.leaves(grads))
    assert g_norm > 0  # projector receives gradient


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.array([[-100, 2, -100, 3]])
    # positions contributing: shift -> labels[1:] = [2, -100, 3]
    loss = causal_lm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


def test_text_only_batch(tiny_vision_model):
    model = tiny_vision_model
    pixels = np.random.RandomState(2).rand(1, 28, 28, 3).astype(np.float32)
    ids0 = np.array([1, IMG, 5])
    ids1 = np.array([1, 6, 7, 8])  # no modality
    out = model.generate([ids0, ids1], {"vision": pixels}, max_new_tokens=3,
                         bucket_len=16)
    assert len(out) == 2


def test_device_loop_matches_host_loop(tiny_vision_model):
    import modelcompose_tpu.core.generate as gen
    model = tiny_vision_model
    proc = model.modal_processors()["vision"]
    import numpy as np
    from PIL import Image
    img = Image.fromarray(
        (np.random.RandomState(3).rand(40, 50, 3) * 255).astype(np.uint8))
    pixels = proc([img])
    ids = [np.array([1, 5, IMG, 9])]
    embeds, plan = model.prepare_batch(ids, {"vision": pixels},
                                       bucket_len=16)
    kwargs = dict(lengths=plan.lengths, route_ids=plan.route_ids,
                  routing_table=model.routing_table,
                  segment_ids=plan.segment_ids, max_new_tokens=6)
    dev = gen.generate(model.params, model.cfg, embeds, device_loop=True,
                       **kwargs)
    host = gen.generate(model.params, model.cfg, embeds, device_loop=False,
                        **kwargs)
    assert dev == host, (dev, host)
    # the concat decode fold must hold on BOTH loops (the host loop used
    # to silently ignore it and stream unfolded adapters)
    dev_f = gen.generate(model.params, model.cfg, embeds, device_loop=True,
                         fold_decode="concat", **kwargs)
    host_f = gen.generate(model.params, model.cfg, embeds,
                          device_loop=False, fold_decode="concat", **kwargs)
    assert dev_f == dev and host_f == dev, (dev, dev_f, host_f)


def test_fold_decode_generate_equivalence(tiny_vision_model):
    import modelcompose_tpu.core.generate as gen
    model = tiny_vision_model
    pixels = np.random.RandomState(5).rand(1, 28, 28, 3).astype(np.float32)
    ids = [np.array([1, 5, IMG, 9])]
    embeds, plan = model.prepare_batch(ids, {"vision": pixels},
                                       bucket_len=16)
    kwargs = dict(lengths=plan.lengths, route_ids=plan.route_ids,
                  routing_table=model.routing_table,
                  segment_ids=plan.segment_ids, max_new_tokens=6)
    folded = gen.generate(model.params, model.cfg, embeds,
                          fold_decode=True, **kwargs)
    plain = gen.generate(model.params, model.cfg, embeds,
                         fold_decode=False, **kwargs)
    assert folded == plain


def test_rms_norm_matches_hf_431_bf16_rounding():
    """HF 4.31 LlamaRMSNorm multiplies weight by normed.to(input_dtype)
    (cast BEFORE the weight multiply); the bf16 rounding must match
    element-for-element, not just to tolerance."""
    import jax.numpy as jnp
    import torch

    from modelcompose_tpu.ops.norms import rms_norm

    rs = np.random.RandomState(0)
    x = rs.randn(4, 64).astype(np.float32)
    w = (1 + 0.1 * rs.randn(64)).astype(np.float32)
    eps = 1e-5

    tx = torch.from_numpy(x).to(torch.bfloat16)
    tw = torch.from_numpy(w).to(torch.bfloat16)
    hidden = tx.to(torch.float32)
    var = hidden.pow(2).mean(-1, keepdim=True)
    hidden = hidden * torch.rsqrt(var + eps)
    ref = (tw * hidden.to(torch.bfloat16)).to(torch.float32).numpy()

    ours = rms_norm(jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(w, jnp.bfloat16), eps=eps)
    np.testing.assert_array_equal(np.asarray(ours, np.float32), ref)
