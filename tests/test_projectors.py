"""Projector parity vs torch oracles built to the reference's spec
(reference: modelcompose/model/multimodal_projector/builder.py:111-226)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from modelcompose_tpu.models.projectors import (QFORMER_HEADS, QFORMER_HIDDEN,
                                                QFORMER_INTERMEDIATE,
                                                apply_projector,
                                                init_projector, output_len,
                                                parse_spec)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_parse_spec():
    assert parse_spec("linear")["kind"] == "linear"
    assert parse_spec("mlp2x_gelu") == {"kind": "mlp", "depth": 2}
    assert parse_spec("qformer_32N_2L") == {"kind": "qformer", "n_query": 32,
                                            "n_layers": 2}
    with pytest.raises(ValueError):
        parse_spec("bogus")


def test_output_len():
    assert output_len("qformer_32N_2L", 999) == 32
    assert output_len("mlp2x_gelu", 57) == 57


def test_mlp2x_gelu_matches_torch():
    torch.manual_seed(0)
    d_in, d_out = 16, 24
    seq = nn.Sequential(nn.Linear(d_in, d_out), nn.GELU(),
                        nn.Linear(d_out, d_out))
    params = {"layers": [
        {"w": t2j(seq[0].weight).T, "b": t2j(seq[0].bias)},
        {"w": t2j(seq[2].weight).T, "b": t2j(seq[2].bias)},
    ]}
    x = torch.randn(2, 5, d_in)
    want = seq(x).detach().numpy()
    got = np.asarray(apply_projector("mlp2x_gelu", params, t2j(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


class TorchQformerOracle(nn.Module):
    """Minimal reimplementation of VideoLlamaAudioQformer semantics
    (post-LN BERT w/ cross-attn every layer, query-only FFN)."""

    def __init__(self, n_query, d_in, n_layers, d_out):
        super().__init__()
        H = QFORMER_HIDDEN
        self.query_tokens = nn.Parameter(torch.randn(1, n_query, H) * 0.02)
        self.pos_emb = nn.Embedding(1024, d_in)
        self.emb_ln = nn.LayerNorm(H, eps=1e-12)
        self.layers = nn.ModuleList()
        for _ in range(n_layers):
            layer = nn.ModuleDict({
                "sq": nn.Linear(H, H), "sk": nn.Linear(H, H),
                "sv": nn.Linear(H, H), "so": nn.Linear(H, H),
                "sln": nn.LayerNorm(H, eps=1e-12),
                "cq": nn.Linear(H, H), "ck": nn.Linear(d_in, H),
                "cv": nn.Linear(d_in, H), "co": nn.Linear(H, H),
                "cln": nn.LayerNorm(H, eps=1e-12),
                "w1": nn.Linear(H, QFORMER_INTERMEDIATE),
                "w2": nn.Linear(QFORMER_INTERMEDIATE, H),
                "fln": nn.LayerNorm(H, eps=1e-12),
            })
            self.layers.append(layer)
        self.proj = nn.Linear(H, d_out)

    @staticmethod
    def _attn(q, k, v):
        B, Q, H = q.shape
        hd = H // QFORMER_HEADS
        q = q.view(B, Q, QFORMER_HEADS, hd).transpose(1, 2)
        k = k.view(B, -1, QFORMER_HEADS, hd).transpose(1, 2)
        v = v.view(B, -1, QFORMER_HEADS, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), dim=-1)
        return (a @ v).transpose(1, 2).reshape(B, Q, H)

    def forward(self, x):
        B, T, _ = x.shape
        x = x + self.pos_emb(torch.arange(T))[None]
        q = self.emb_ln(self.query_tokens.expand(B, -1, -1))
        for m in self.layers:
            ctx = self._attn(m["sq"](q), m["sk"](q), m["sv"](q))
            q = m["sln"](m["so"](ctx) + q)
            ctx = self._attn(m["cq"](q), m["ck"](x), m["cv"](x))
            q = m["cln"](m["co"](ctx) + q)
            q = m["fln"](m["w2"](nn.functional.gelu(m["w1"](q))) + q)
        return self.proj(q)


def test_qformer_matches_torch_oracle():
    torch.manual_seed(1)
    n_query, d_in, n_layers, d_out = 4, 32, 2, 20
    oracle = TorchQformerOracle(n_query, d_in, n_layers, d_out)

    def dense(lin):
        return {"w": t2j(lin.weight).T, "b": t2j(lin.bias)}

    def lnp(ln):
        return {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}

    params = {
        "query_tokens": t2j(oracle.query_tokens[0]),
        "position_embedding": t2j(oracle.pos_emb.weight),
        "embeddings_ln": lnp(oracle.emb_ln),
        "llama_proj": dense(oracle.proj),
        "layers": [],
    }
    for m in oracle.layers:
        params["layers"].append({
            "self": {"q": dense(m["sq"]), "k": dense(m["sk"]),
                     "v": dense(m["sv"]), "o": dense(m["so"]),
                     "ln": lnp(m["sln"])},
            "cross": {"q": dense(m["cq"]), "k": dense(m["ck"]),
                      "v": dense(m["cv"]), "o": dense(m["co"]),
                      "ln": lnp(m["cln"])},
            "ffn": {"w1": dense(m["w1"]), "w2": dense(m["w2"]),
                    "ln": lnp(m["fln"])},
        })

    x = torch.randn(2, 6, d_in)
    want = oracle(x).detach().numpy()
    got = np.asarray(apply_projector(f"qformer_{n_query}N_{n_layers}L",
                                     params, t2j(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_init_shapes():
    p = init_projector("qformer_8N_2L", jax.random.PRNGKey(0), 48, 64)
    assert p["query_tokens"].shape == (8, QFORMER_HIDDEN)
    assert p["position_embedding"].shape == (1024, 48)
    assert len(p["layers"]) == 2
    y = apply_projector("qformer_8N_2L", p,
                        jnp.ones((3, 11, 48), jnp.float32))
    assert y.shape == (3, 8, 64)

    p = init_projector("linear", jax.random.PRNGKey(0), 48, 64)
    y = apply_projector("linear", p, jnp.ones((2, 5, 48)))
    assert y.shape == (2, 5, 64)
