"""BEATs tower: bucket function goldens, torch-oracle parity for the
transformer layer stack, processor framing
(reference: modelcompose/model/multimodal_encoder/beats/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from modelcompose_tpu.data.audio_processing import (BeatsAudioProcessor,
                                                    kaldi_fbank,
                                                    kaldi_mel_banks)
from modelcompose_tpu.models.audio_beats import (BeatsConfig,
                                                 beats_extract_features,
                                                 convert_beats_checkpoint,
                                                 init_beats,
                                                 relative_position_bucket)


def test_relative_position_bucket_goldens():
    # T5 bidirectional bucketing, num_buckets=32, max_distance=128:
    # small |d| exact, then log-spaced; positive direction offset by 16.
    rel = jnp.array([[0, 1, -1, 7, -7, 8, 100, -100]])
    out = np.asarray(relative_position_bucket(rel, 32, 128))
    assert out[0, 0] == 0
    assert out[0, 1] == 17       # d=1 positive -> 16 + 1
    assert out[0, 2] == 1        # d=-1 -> |1| exact
    assert out[0, 3] == 16 + 7
    assert out[0, 4] == 7
    # |8| == max_exact -> log region start
    assert out[0, 5] >= 16 + 8
    assert out[0, 6] == 16 + 15  # capped at num_buckets//2 - 1
    assert out[0, 7] == 15


class TorchBeatsOracle(nn.Module):
    """Self-contained mirror of the BEATs encoder math (post-LN, deep-norm,
    shared rel bias + per-layer gru gating) for small dims."""

    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        self.cfg = cfg
        E, H, Fd = cfg.embed_dim, cfg.encoder_embed_dim, \
            cfg.encoder_ffn_embed_dim
        L, P = cfg.encoder_layers, cfg.input_patch_size
        self.patch = nn.Conv2d(1, E, P, P, bias=False)
        self.ln0 = nn.LayerNorm(E)
        self.proj = nn.Linear(E, H)
        self.pos_conv = nn.Conv1d(H, H, cfg.conv_pos,
                                  padding=cfg.conv_pos // 2,
                                  groups=cfg.conv_pos_groups)
        self.enc_ln = nn.LayerNorm(H)
        self.rel_bias = nn.Embedding(cfg.num_buckets,
                                     cfg.encoder_attention_heads)
        self.layers = nn.ModuleList()
        for _ in range(L):
            self.layers.append(nn.ModuleDict({
                "q": nn.Linear(H, H), "k": nn.Linear(H, H),
                "v": nn.Linear(H, H), "o": nn.Linear(H, H),
                "grep": nn.Linear(H // cfg.encoder_attention_heads, 8),
                "ln1": nn.LayerNorm(H),
                "fc1": nn.Linear(H, Fd), "fc2": nn.Linear(Fd, H),
                "ln2": nn.LayerNorm(H),
            }))
        self.grep_a = nn.Parameter(torch.ones(
            L, 1, cfg.encoder_attention_heads, 1, 1))

    def compute_bias(self, T):
        from modelcompose_tpu.models.audio_beats import \
            relative_position_bucket as rpb
        ctx = torch.arange(T)[:, None]
        mem = torch.arange(T)[None, :]
        buckets = torch.from_numpy(np.asarray(rpb(
            jnp.asarray((mem - ctx).numpy()), self.cfg.num_buckets,
            self.cfg.max_distance))).long()
        return self.rel_bias(buckets).permute(2, 0, 1)  # [H, T, T]

    def forward(self, fbank):
        cfg = self.cfg
        B = fbank.shape[0]
        x = self.patch(fbank.unsqueeze(1))           # [B, E, n1, n2]
        x = x.reshape(B, x.shape[1], -1).transpose(1, 2)
        x = self.ln0(x)
        x = self.proj(x)
        conv = self.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        if cfg.conv_pos % 2 == 0:
            conv = conv[:, :-1]
        x = x + F.gelu(conv)
        x = self.enc_ln(x)

        T = x.shape[1]
        nh = cfg.encoder_attention_heads
        hd = cfg.head_dim
        bias = self.compute_bias(T)                  # [H, T, T]
        alpha = cfg.deep_norm_alpha
        for li, m in enumerate(self.layers):
            q = m["q"](x).view(B, T, nh, hd)
            k = m["k"](x).view(B, T, nh, hd)
            v = m["v"](x).view(B, T, nh, hd)
            logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            gate_in = m["grep"](q.permute(0, 2, 1, 3))  # [B,H,T,8]
            gates = torch.sigmoid(gate_in.view(B, nh, T, 2, 4).sum(-1))
            gate_a, gate_b = gates[..., 0], gates[..., 1]
            grep_a = self.grep_a[li].reshape(1, nh, 1)
            gate_a_1 = gate_a * (gate_b * grep_a - 1.0) + 2.0
            logits = logits + gate_a_1.unsqueeze(-1) * bias.unsqueeze(0)
            probs = torch.softmax(logits, dim=-1)
            ctx = torch.einsum("bhqk,bkhd->bqhd", probs, v)
            attn = m["o"](ctx.reshape(B, T, nh * hd))
            x = m["ln1"](x * alpha + attn)
            h = m["fc2"](F.gelu(m["fc1"](x)))
            x = m["ln2"](x * alpha + h)
        return x


def _oracle_to_params(oracle: TorchBeatsOracle, cfg: BeatsConfig):
    def d(lin):
        return {"w": jnp.asarray(lin.weight.detach().numpy().T),
                "b": jnp.asarray(lin.bias.detach().numpy())}

    def ln(l):
        return {"scale": jnp.asarray(l.weight.detach().numpy()),
                "bias": jnp.asarray(l.bias.detach().numpy())}

    def stack(fn):
        outs = [fn(m) for m in oracle.layers]
        return jax.tree.map(lambda *x: jnp.stack(x), *outs)

    return {
        "patch_embedding": jnp.asarray(
            oracle.patch.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "layer_norm": ln(oracle.ln0),
        "post_extract_proj": d(oracle.proj),
        "pos_conv": {
            "w": jnp.asarray(oracle.pos_conv.weight.detach().numpy()
                             .transpose(2, 1, 0)),
            "b": jnp.asarray(oracle.pos_conv.bias.detach().numpy()),
        },
        "encoder_layer_norm": ln(oracle.enc_ln),
        "rel_bias": jnp.asarray(oracle.rel_bias.weight.detach().numpy()),
        "layers": {
            "q": stack(lambda m: d(m["q"])),
            "k": stack(lambda m: d(m["k"])),
            "v": stack(lambda m: d(m["v"])),
            "o": stack(lambda m: d(m["o"])),
            "grep_linear": stack(lambda m: d(m["grep"])),
            "grep_a": jnp.asarray(oracle.grep_a.detach().numpy()),
            "self_attn_ln": stack(lambda m: ln(m["ln1"])),
            "fc1": stack(lambda m: d(m["fc1"])),
            "fc2": stack(lambda m: d(m["fc2"])),
            "final_ln": stack(lambda m: ln(m["ln2"])),
        },
    }


def test_beats_matches_torch_oracle():
    cfg = BeatsConfig(input_patch_size=4, embed_dim=16, encoder_layers=2,
                      encoder_embed_dim=24, encoder_ffn_embed_dim=48,
                      encoder_attention_heads=4, conv_pos=8,
                      conv_pos_groups=4, num_buckets=32, max_distance=64,
                      fbank_bins=8)
    torch.manual_seed(0)
    oracle = TorchBeatsOracle(cfg)
    oracle.eval()
    params = _oracle_to_params(oracle, cfg)

    fbank = torch.randn(2, 16, 8)
    with torch.no_grad():
        want = oracle(fbank).numpy()
    got, mask = beats_extract_features(params, cfg,
                                       jnp.asarray(fbank.numpy()))
    assert mask is None
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_beats_padding_mask_downsample():
    cfg = BeatsConfig(input_patch_size=4, embed_dim=16, encoder_layers=1,
                      encoder_embed_dim=24, encoder_ffn_embed_dim=48,
                      encoder_attention_heads=4, conv_pos=8,
                      conv_pos_groups=4, num_buckets=32, max_distance=64,
                      fbank_bins=8)
    params = init_beats(cfg, jax.random.PRNGKey(0))
    fbank = jnp.ones((1, 16, 8))
    pad = jnp.asarray(np.r_[np.zeros(8, bool), np.ones(8, bool)])[None]
    x, mask = beats_extract_features(params, cfg, fbank, pad)
    # 16 frames / patch 4 -> n1=4, n2=2 -> T=8; waveform mask [16] ->
    # view(8, 2).all(-1): frames 4..7 padded
    assert mask.shape == (1, 8)
    assert np.asarray(mask)[0].tolist() == [False] * 4 + [True] * 4


def test_convert_beats_checkpoint_roundtrip():
    cfg = BeatsConfig(input_patch_size=4, embed_dim=16, encoder_layers=2,
                      encoder_embed_dim=24, encoder_ffn_embed_dim=48,
                      encoder_attention_heads=4, conv_pos=8,
                      conv_pos_groups=4, num_buckets=32, max_distance=64)
    rs = np.random.RandomState(0)
    state = {}
    state["patch_embedding.weight"] = rs.randn(16, 1, 4, 4)
    state["layer_norm.weight"] = rs.randn(16)
    state["layer_norm.bias"] = rs.randn(16)
    state["post_extract_proj.weight"] = rs.randn(24, 16)
    state["post_extract_proj.bias"] = rs.randn(24)
    state["encoder.pos_conv.0.weight_g"] = np.abs(rs.randn(1, 1, 8))
    state["encoder.pos_conv.0.weight_v"] = rs.randn(24, 6, 8)
    state["encoder.pos_conv.0.bias"] = rs.randn(24)
    state["encoder.layer_norm.weight"] = rs.randn(24)
    state["encoder.layer_norm.bias"] = rs.randn(24)
    state["encoder.layers.0.self_attn.relative_attention_bias.weight"] = \
        rs.randn(32, 4)
    for i in range(2):
        p = f"encoder.layers.{i}"
        for nm, shp in [("self_attn.q_proj", (24, 24)),
                        ("self_attn.k_proj", (24, 24)),
                        ("self_attn.v_proj", (24, 24)),
                        ("self_attn.out_proj", (24, 24)),
                        ("self_attn.grep_linear", (8, 6)),
                        ("fc1", (48, 24)), ("fc2", (24, 48))]:
            state[f"{p}.{nm}.weight"] = rs.randn(*shp)
            state[f"{p}.{nm}.bias"] = rs.randn(shp[0])
        state[f"{p}.self_attn.grep_a"] = rs.randn(1, 4, 1, 1)
        for nm in ("self_attn_layer_norm", "final_layer_norm"):
            state[f"{p}.{nm}.weight"] = rs.randn(24)
            state[f"{p}.{nm}.bias"] = rs.randn(24)
    params = convert_beats_checkpoint(state, cfg)
    x, _ = beats_extract_features(params, cfg, jnp.ones((1, 16, 8)))
    assert x.shape == (1, 8, 24)
    # weight-norm reconstruction: ||w_eff[:, :, k]|| == g[k]
    w = np.asarray(params["pos_conv"]["w"])  # [k, in/g, out]
    norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(
        norms, state["encoder.pos_conv.0.weight_g"][0, 0], rtol=1e-5)


# ------------------------------------------------------------- processor

def test_kaldi_fbank_shapes_and_framing():
    wav = np.random.RandomState(0).randn(16000).astype(np.float32)
    fb = kaldi_fbank(wav * 2 ** 15)
    # snip_edges: 1 + (16000-400)//160 = 98 frames
    assert fb.shape == (98, 128)
    assert np.isfinite(fb).all()


def test_mel_banks_partition():
    banks = kaldi_mel_banks(128, 512, 16000)
    assert banks.shape == (128, 256)
    assert (banks >= 0).all()
    # 128 bins over a 512-pt FFT: low filters can be narrower than one
    # fft bin and legitimately empty (kaldi warns about this too); the
    # vast majority must have support and the upper half always does.
    assert (banks.sum(axis=1) > 0).mean() > 0.9
    assert (banks[64:].sum(axis=1) > 0).all()


def test_processor_eval_padding():
    proc = BeatsAudioProcessor()
    wav = np.random.RandomState(1).randn(16000).astype(np.float32)
    feats, mask = proc([wav])
    # 98 frames -> padded to 512
    assert feats.shape == (1, 512, 128)
    assert mask.shape == (1, 512)
    assert not mask.any()  # process_one marks everything valid


def test_processor_batch_pads_with_mask():
    proc = BeatsAudioProcessor()
    w1 = np.random.RandomState(1).randn(16000).astype(np.float32)
    w2 = np.random.RandomState(2).randn(16000 * 6).astype(np.float32)
    feats, mask = proc([w1, w2])
    assert feats.shape[1] == mask.shape[1] == 1024  # 598 -> 1024
    assert mask[0, 600:].all()  # clip 1 padded beyond its window
