"""GOLDEN parity against the reference's own code (run from /root/reference
via the auto-stub loader): conversation prompts, modal tokenization, EvalAI
normalization, TIES arithmetic, and the merge CLI end-to-end."""

import json
import os
import re
import sys

import numpy as np
import pytest

from tests.fake_tokenizer import FakeLlamaTokenizer
from tests.reference_oracle import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")


@pytest.fixture(scope="module")
def ref():
    from tests.reference_oracle import load_reference_arch
    load_reference_arch()
    sys.path.insert(0, os.path.join(REFERENCE_ROOT,
                                    "scripts/model_composition"))
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "modelcompose/eval"))
    import m4c_evaluator as ref_m4c
    import merge_unimodal_modelcompose as ref_merge
    import modelcompose.conversation as ref_conv
    import modelcompose.mm_utils as ref_mm
    import ties_merging as ref_ties
    return dict(conv=ref_conv, mm=ref_mm, ties=ref_ties, merge=ref_merge,
                m4c=ref_m4c)


# ---------------------------------------------------------------- prompts

def test_conversation_prompts_byte_identical(ref):
    from modelcompose_tpu.data.conversation import conv_templates
    turns = [("hi there <image>\nwhat is this?", "It is a cat."),
             ("and this <audio> one?", None)]
    # 'plain' is excluded: its sep2 is None and get_prompt crashes on a
    # completed assistant turn in the reference too — it is only ever used
    # through preprocess_plain (string concat), which we mirror directly.
    for name in ("vicuna_v1", "v1", "llama_2", "mpt", "v0",
                 "llava_v1", "llava_llama_2", "v0_mmtag", "v1_mmtag"):
        ours = conv_templates[name].copy()
        theirs = ref["conv"].conv_templates[name].copy()
        for user, assistant in turns:
            ours.append_message(ours.roles[0], user)
            ours.append_message(ours.roles[1], assistant)
            theirs.append_message(theirs.roles[0], user)
            theirs.append_message(theirs.roles[1], assistant)
        assert ours.get_prompt() == theirs.get_prompt(), name


# ----------------------------------------------------------- tokenization

def test_tokenizer_modal_token_identical(ref):
    from modelcompose_tpu.data.tokenization import (tokenizer_image_token,
                                                    tokenizer_modal_token)
    tok = FakeLlamaTokenizer()
    prompts = [
        "hello world",
        "<image>\nwhat is this?",
        "a <image> b <audio> c <point> d <video> e",
        "<audio><image>back to back",
        "ends with modal <point>",
    ]
    for p in prompts:
        assert tokenizer_modal_token(p, tok) == \
            ref["mm"].tokenizer_modal_token(p, tok), p
        if "<image>" in p and "<audio>" not in p and "<point>" not in p \
                and "<video>" not in p:
            assert tokenizer_image_token(p, tok) == \
                ref["mm"].tokenizer_image_token(p, tok), p


# ------------------------------------------------------------- normalizer

def test_evalai_processor_identical(ref):
    from modelcompose_tpu.eval.m4c_evaluator import EvalAIAnswerProcessor
    ours = EvalAIAnswerProcessor()
    theirs = ref["m4c"].EvalAIAnswerProcessor()
    answers = ["The Cat.", "Two", "isnt", "A  dog!", "3,000", "won't stop",
               "it's a semi-colon; really", "one hundred", "none", "Yes!",
               "whats that", "oclock", "a,b", "x/y", "10.5", "1,234,567"]
    for a in answers:
        assert ours(a) == theirs(a), a


# ------------------------------------------------------------------ TIES

def test_ties_merging_identical(ref):
    import torch
    from modelcompose_tpu.compose.ties import do_merging
    rs = np.random.RandomState(0)
    ft = [{"x": rs.randn(17).astype(np.float32),
           "y": rs.randn(4, 5).astype(np.float32)} for _ in range(3)]
    for K in (20, 50, 90):
        for func in ("dis-sum", "dis-mean", "dis-max"):
            theirs = ref["ties"].do_merging(
                [{k: torch.from_numpy(v) for k, v in c.items()}
                 for c in ft], K=K, merge_func=func)
            ours = do_merging(ft, K=K, merge_func=func)
            for key in ours:
                np.testing.assert_allclose(
                    ours[key], theirs[key].numpy(), rtol=1e-6,
                    err_msg=f"K={K} func={func} key={key}")


# ------------------------------------------------------------- merge CLI

def _write_ckpt_torch(d, weights, config):
    import torch
    os.makedirs(d, exist_ok=True)
    torch.save({k: torch.from_numpy(v) for k, v in weights.items()},
               os.path.join(d, "adapter_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)


@pytest.mark.parametrize("strategy", [
    "sum", "mean", "ties-mean", "ties-sum", "ties-max",
    "online-merge-reset-default-vision=0.5,default-audio=0.5",
    "online-merge-mean",
])
def test_merge_cli_identical(ref, tmp_path, strategy):
    from modelcompose_tpu.compose.merge import merge_checkpoints
    from modelcompose_tpu.compose.state_io import load_state
    rs = np.random.RandomState(1)
    shared = "model.layers.0.self_attn.q_proj.lora_A.default.weight"
    vis_w = {shared: rs.randn(4, 8).astype(np.float32),
             "model.layers.0.self_attn.q_proj.lora_A.vision.weight":
             rs.randn(4, 8).astype(np.float32)}
    aud_w = {shared: rs.randn(4, 8).astype(np.float32),
             "model.layers.0.self_attn.q_proj.lora_A.audio.weight":
             rs.randn(4, 8).astype(np.float32)}
    vis_cfg = {"mm_vision_encoder": "clip", "lora_r": 4, "lora_alpha": 8,
               "lora_strategy": "modal+language"}
    aud_cfg = {"mm_audio_encoder": "beats", "lora_r": 4, "lora_alpha": 8,
               "lora_strategy": "modal+language"}
    a = str(tmp_path / "vis")
    b = str(tmp_path / "aud")
    _write_ckpt_torch(a, vis_w, vis_cfg)
    _write_ckpt_torch(b, aud_w, aud_cfg)

    out_ref = str(tmp_path / "ref_out")
    out_ours = str(tmp_path / "our_out")
    ref["merge"].merge_checkpoints([a, b], out_ref, strategy, K=50)
    merge_checkpoints([a, b], out_ours, strategy, K=50)

    theirs = load_state(os.path.join(out_ref, "adapter_model.bin"))
    ours = load_state(os.path.join(out_ours, "adapter_model.safetensors"))
    assert sorted(theirs) == sorted(ours), strategy
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-6,
                                   err_msg=f"{strategy}:{k}")

    cfg_ref = json.load(open(os.path.join(out_ref, "config.json")))
    cfg_ours = json.load(open(os.path.join(out_ours, "config.json")))
    assert cfg_ref == cfg_ours, strategy

    # merge_info strategy tag matches (paths differ by design)
    def tag(path):
        text = open(os.path.join(path, "merge_info.txt")).read()
        return re.search(r"Output\((.*?)\):", text, re.DOTALL).group(1)

    assert tag(out_ref) == tag(out_ours), strategy


# ------------------------------------------------------------- preprocess

def test_preprocess_v1_identical(ref):
    import modelcompose.conversation as ref_conv_lib
    import modelcompose.data.utils as ref_utils

    from modelcompose_tpu.data import conversation as conversation_lib
    from modelcompose_tpu.data.conversation import conv_templates
    from modelcompose_tpu.data.preprocess import preprocess

    tok = FakeLlamaTokenizer()
    sources = [[{"from": "human", "value": "<image>\nwhat is shown"},
                {"from": "gpt", "value": "a small cat"},
                {"from": "human", "value": "any <audio> sound"},
                {"from": "gpt", "value": "meowing"}]]

    conversation_lib.default_conversation = conv_templates["vicuna_v1"]
    ref_conv_lib.default_conversation = \
        ref_conv_lib.conv_templates["vicuna_v1"]

    ours = preprocess(sources, tok, has_image=True)
    theirs = ref_utils.preprocess(sources, tok, has_image=True)
    np.testing.assert_array_equal(ours["input_ids"][0],
                                  theirs["input_ids"][0].numpy())
    np.testing.assert_array_equal(ours["labels"][0],
                                  theirs["labels"][0].numpy())


def test_preprocess_mpt_identical(ref):
    import modelcompose.conversation as ref_conv_lib
    import modelcompose.data.utils as ref_utils

    from modelcompose_tpu.data import conversation as conversation_lib
    from modelcompose_tpu.data.conversation import conv_templates
    from modelcompose_tpu.data.preprocess import preprocess

    tok = FakeLlamaTokenizer()
    sources = [[{"from": "human", "value": "<image>\nwhat is shown"},
                {"from": "gpt", "value": "a small cat"},
                {"from": "human", "value": "any <audio> sound"},
                {"from": "gpt", "value": "meowing"}]]

    conversation_lib.default_conversation = conv_templates["mpt"]
    ref_conv_lib.default_conversation = ref_conv_lib.conv_templates["mpt"]

    # The reference's preprocess_mpt references tokenizer_image_token
    # without importing it (latent NameError in the shipped code,
    # reference: data/utils.py:283); restore the intended import from
    # mm_utils so the oracle runs.
    if not hasattr(ref_utils, "tokenizer_image_token"):
        from modelcompose.mm_utils import tokenizer_image_token
        ref_utils.tokenizer_image_token = tokenizer_image_token

    ours = preprocess(sources, tok, has_image=True)
    theirs = ref_utils.preprocess(sources, tok)
    np.testing.assert_array_equal(ours["input_ids"][0],
                                  theirs["input_ids"][0].numpy())
    np.testing.assert_array_equal(ours["labels"][0],
                                  theirs["labels"][0].numpy())


def test_preprocess_default_v0_identical(ref):
    """The '### ' signal fallback (reference data/utils.py:346-371), both
    with and without modal tokens.  The reference mutates its sources in
    place, so each side gets its own deep copy."""
    import copy

    import modelcompose.conversation as ref_conv_lib
    import modelcompose.data.utils as ref_utils

    from modelcompose_tpu.data import conversation as conversation_lib
    from modelcompose_tpu.data.conversation import conv_templates
    from modelcompose_tpu.data.preprocess import preprocess

    tok = FakeLlamaTokenizer()
    sources = [[{"from": "human", "value": "<image>\nwhat is shown"},
                {"from": "gpt", "value": "a small cat"},
                {"from": "human", "value": "and sound?"},
                {"from": "gpt", "value": "meowing"}]]

    conversation_lib.default_conversation = conv_templates["v0"]
    ref_conv_lib.default_conversation = ref_conv_lib.conv_templates["v0"]

    for has_image in (True, False):
        ours = preprocess(copy.deepcopy(sources), tok, has_image=has_image)
        theirs = ref_utils.preprocess(copy.deepcopy(sources), tok,
                                      has_image=has_image)
        np.testing.assert_array_equal(ours["input_ids"][0],
                                      theirs["input_ids"][0].numpy(),
                                      err_msg=f"has_image={has_image}")
        np.testing.assert_array_equal(ours["labels"][0],
                                      theirs["labels"][0].numpy(),
                                      err_msg=f"has_image={has_image}")


def test_preprocess_plain_identical(ref):
    import modelcompose.conversation as ref_conv_lib
    import modelcompose.data.utils as ref_utils

    from modelcompose_tpu.data import conversation as conversation_lib
    from modelcompose_tpu.data.conversation import conv_templates
    from modelcompose_tpu.data.preprocess import preprocess

    tok = FakeLlamaTokenizer()
    sources = [[{"from": "human", "value": "<image>"},
                {"from": "gpt", "value": "a dog on grass"}]]
    conversation_lib.default_conversation = conv_templates["plain"]
    ref_conv_lib.default_conversation = ref_conv_lib.conv_templates["plain"]
    ours = preprocess(sources, tok, has_image=True)
    theirs = ref_utils.preprocess(sources, tok, has_image=True)
    np.testing.assert_array_equal(ours["input_ids"][0],
                                  theirs["input_ids"][0].numpy())
    np.testing.assert_array_equal(ours["labels"][0],
                                  theirs["labels"][0].numpy())


# --------------------------------------------------- LocalLoraLinear math

def test_routed_lora_matches_reference_local_lora_linear(ref):
    """Our masked-einsum routing == the reference's dict-dispatch
    LocalLoraLinear (reference: multimodal_llama.py:120-160), including the
    online-merge reset-scaling 'default' mix (:92-148)."""
    import torch
    import modelcompose.model.language_model.multimodal_llama as ref_ml

    import jax.numpy as jnp
    from modelcompose_tpu.config import ModelConfig, ROUTE_CLASS_INDEX
    from modelcompose_tpu.ops.routed_lora import routed_lora_matmul

    torch.manual_seed(0)
    d_in, d_out, r = 8, 16, 4
    reset = "default-vision=0.5,default-audio=0.25"
    lin = ref_ml.LocalLoraLinear(
        ["default", "audio", "vision"], d_in, d_out, r=r, lora_alpha=8,
        lora_dropout=0.0, reset_scaling_weights=reset)
    with torch.no_grad():
        if lin.bias is not None:
            lin.bias.zero_()
        for name in lin.lora_B:  # make zero-init B non-trivial
            lin.lora_B[name].weight.add_(
                torch.randn_like(lin.lora_B[name].weight) * 0.1)
    lin.eval()

    x = torch.randn(2, 5, d_in)
    with torch.no_grad():
        outs = lin(x, active_adapters=["default", "audio", "vision"])

    cfg = ModelConfig(hidden_size=d_in, lora_r=r, lora_alpha=8,
                      lora_strategy="modal+language",
                      mm_vision_encoder="clip", mm_audio_encoder="beats",
                      reset_scaling_weights=reset)
    names = cfg.adapter_names()
    assert names == ["default", "audio", "vision", "default-audio",
                     "default-vision"]
    A = jnp.stack([jnp.asarray(lin.lora_A[n].weight.detach().numpy().T)
                   for n in names])
    B = jnp.stack([jnp.asarray(lin.lora_B[n].weight.detach().numpy().T)
                   for n in names])
    W = jnp.asarray(lin.weight.detach().numpy().T)
    table = jnp.asarray(cfg.routing_table())
    xj = jnp.asarray(x.numpy())

    for cls_name, ref_key in (("default", "default"), ("audio", "audio"),
                              ("vision", "vision")):
        cls = ROUTE_CLASS_INDEX[cls_name] if cls_name != "default" else 0
        route = jnp.broadcast_to(table[cls], (2, 5, len(names)))
        ours = routed_lora_matmul(xj, W, A, B, route)
        np.testing.assert_allclose(np.asarray(ours),
                                   outs[ref_key].numpy(), atol=1e-5,
                                   err_msg=cls_name)


def test_routed_lora_matches_reference_no_merge(ref):
    import torch
    import modelcompose.model.language_model.multimodal_llama as ref_ml

    import jax.numpy as jnp
    from modelcompose_tpu.config import ModelConfig, ROUTE_CLASS_INDEX
    from modelcompose_tpu.ops.routed_lora import routed_lora_matmul

    torch.manual_seed(2)
    d_in, d_out, r = 8, 12, 4
    lin = ref_ml.LocalLoraLinear(["default", "vision"], d_in, d_out, r=r,
                                 lora_alpha=8, lora_dropout=0.0)
    with torch.no_grad():
        if lin.bias is not None:
            lin.bias.zero_()
        for name in lin.lora_B:
            lin.lora_B[name].weight.add_(
                torch.randn_like(lin.lora_B[name].weight) * 0.1)
    lin.eval()
    x = torch.randn(1, 4, d_in)
    with torch.no_grad():
        outs = lin(x, active_adapters=["default", "vision"])

    cfg = ModelConfig(hidden_size=d_in, lora_r=r, lora_alpha=8,
                      lora_strategy="modal+language",
                      mm_vision_encoder="clip")
    names = cfg.adapter_names()
    A = jnp.stack([jnp.asarray(lin.lora_A[n].weight.detach().numpy().T)
                   for n in names])
    B = jnp.stack([jnp.asarray(lin.lora_B[n].weight.detach().numpy().T)
                   for n in names])
    W = jnp.asarray(lin.weight.detach().numpy().T)
    table = jnp.asarray(cfg.routing_table())
    xj = jnp.asarray(x.numpy())
    for cls_name in ("default", "vision"):
        cls = 0 if cls_name == "default" else ROUTE_CLASS_INDEX["vision"]
        route = jnp.broadcast_to(table[cls], (1, 4, len(names)))
        ours = routed_lora_matmul(xj, W, A, B, route)
        np.testing.assert_allclose(np.asarray(ours),
                                   outs[cls_name].numpy(), atol=1e-5,
                                   err_msg=cls_name)
