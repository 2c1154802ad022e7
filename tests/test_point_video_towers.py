"""PointBERT and LanguageBind-video towers: grouping semantics, torch-oracle
parity for the point mini-PointNet + blocks, temporal-attention shape/value
checks (reference: modelcompose/model/multimodal_encoder/{pointbert,
languagebind}/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from modelcompose_tpu.models.point_bert import (PointBertConfig,
                                                PointBertTower,
                                                PointCloudProcessor,
                                                farthest_point_sample,
                                                group_points, knn_point,
                                                point_bert_features)
from modelcompose_tpu.models.video_languagebind import (
    LanguageBindVideoConfig, LanguageBindVideoTower,
    init_languagebind_video, languagebind_video_features)


# --------------------------------------------------------------- grouping

def test_fps_spreads_points():
    # two clusters far apart: fps(2) must pick one from each
    a = np.zeros((1, 8, 3), np.float32)
    a[0, :4] += 0.01 * np.arange(12).reshape(4, 3)
    a[0, 4:] += 100.0
    idx = np.asarray(farthest_point_sample(jnp.asarray(a), 2))
    assert (idx[0, 0] < 4) != (idx[0, 1] < 4)


def test_fps_matches_torch_reference_semantics():
    # same iterative argmax as misc.py:40-63 with fixed start
    rs = np.random.RandomState(0)
    xyz = rs.randn(2, 32, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8))

    def torch_fps(x, npoint):
        B, N, _ = x.shape
        centroids = np.zeros((B, npoint), np.int64)
        distance = np.full((B, N), 1e10)
        farthest = np.zeros((B,), np.int64)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = x[np.arange(B), farthest][:, None]
            dist = ((x - centroid) ** 2).sum(-1)
            distance = np.minimum(distance, dist)
            farthest = distance.argmax(-1)
        return centroids

    np.testing.assert_array_equal(got, torch_fps(xyz, 8))


def test_knn_and_grouping():
    rs = np.random.RandomState(1)
    pts = rs.randn(1, 64, 6).astype(np.float32)
    cfg = PointBertConfig(num_group=4, group_size=8)
    neigh, center = group_points(jnp.asarray(pts), cfg)
    assert neigh.shape == (1, 4, 8, 6)
    assert center.shape == (1, 4, 3)
    # each group's xyz is centered: its nearest member should be ~0 offset
    d = np.linalg.norm(np.asarray(neigh)[0, :, :, :3], axis=-1)
    assert (d.min(axis=1) < 1e-5).all()
    # rgb channels are NOT centered
    idx = np.asarray(knn_point(8, jnp.asarray(pts[..., :3]),
                               jnp.asarray(np.asarray(center))))
    np.testing.assert_allclose(np.asarray(neigh)[0, 0, :, 3:],
                               pts[0, idx[0, 0], 3:], rtol=1e-5)


# -------------------------------------------------- point transformer parity

class TorchPointOracle(nn.Module):
    def __init__(self, cfg: PointBertConfig):
        super().__init__()
        D, E, I = cfg.trans_dim, cfg.encoder_dims, int(cfg.trans_dim * 4)
        self.cfg = cfg
        self.c1 = nn.Conv1d(cfg.point_dims, 128, 1)
        self.b1 = nn.BatchNorm1d(128)
        self.c2 = nn.Conv1d(128, 256, 1)
        self.c3 = nn.Conv1d(512, 512, 1)
        self.b2 = nn.BatchNorm1d(512)
        self.c4 = nn.Conv1d(512, E, 1)
        self.reduce = nn.Linear(E, D)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        self.cls_pos = nn.Parameter(torch.randn(1, 1, D))
        self.pe1 = nn.Linear(3, 128)
        self.pe2 = nn.Linear(128, D)
        self.blocks = nn.ModuleList()
        for _ in range(cfg.depth):
            self.blocks.append(nn.ModuleDict({
                "n1": nn.LayerNorm(D), "qkv": nn.Linear(D, 3 * D),
                "proj": nn.Linear(D, D), "n2": nn.LayerNorm(D),
                "f1": nn.Linear(D, I), "f2": nn.Linear(I, D)}))
        self.norm = nn.LayerNorm(D)

    def forward(self, neigh, center):
        cfg = self.cfg
        B, G, M, C = neigh.shape
        x = neigh.reshape(B * G, M, C).transpose(2, 1)
        f = torch.relu(self.b1(self.c1(x)))
        f = self.c2(f)
        g = f.max(dim=2, keepdim=True)[0]
        f = torch.cat([g.expand(-1, -1, M), f], dim=1)
        f = torch.relu(self.b2(self.c3(f)))
        f = self.c4(f).max(dim=2)[0].reshape(B, G, -1)
        tok = self.reduce(f)
        cls = self.cls_token.expand(B, -1, -1)
        cls_pos = self.cls_pos.expand(B, -1, -1)
        pos = self.pe2(torch.nn.functional.gelu(self.pe1(center)))
        x = torch.cat([cls, tok], dim=1)
        pos = torch.cat([cls_pos, pos], dim=1)
        nh = cfg.num_heads
        hd = cfg.trans_dim // nh
        for m in self.blocks:
            x = x + pos
            h = m["n1"](x)
            qkv = m["qkv"](h).reshape(B, -1, 3, nh, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = torch.softmax(
                torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd), -1)
            ctx = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, -1,
                                                                nh * hd)
            x = x + m["proj"](ctx)
            h = m["n2"](x)
            x = x + m["f2"](torch.nn.functional.gelu(m["f1"](h)))
        return self.norm(x)


def test_point_bert_matches_torch_oracle():
    cfg = PointBertConfig(trans_dim=16, depth=2, num_heads=2, group_size=4,
                          num_group=8, encoder_dims=16, npoints=64)
    torch.manual_seed(0)
    oracle = TorchPointOracle(cfg)
    oracle.eval()

    def d(lin):
        return {"w": jnp.asarray(lin.weight.detach().numpy().T),
                "b": jnp.asarray(lin.bias.detach().numpy())}

    def conv(c):
        return {"w": jnp.asarray(c.weight.detach().numpy()[..., 0].T),
                "b": jnp.asarray(c.bias.detach().numpy())}

    def bn(b):
        return {"scale": jnp.asarray(b.weight.detach().numpy()),
                "bias": jnp.asarray(b.bias.detach().numpy()),
                "mean": jnp.asarray(b.running_mean.numpy()),
                "var": jnp.asarray(b.running_var.numpy())}

    def ln(l):
        return {"scale": jnp.asarray(l.weight.detach().numpy()),
                "bias": jnp.asarray(l.bias.detach().numpy())}

    def stack(fn):
        outs = [fn(m) for m in oracle.blocks]
        return jax.tree.map(lambda *x: jnp.stack(x), *outs)

    params = {
        "encoder": {"conv1": conv(oracle.c1), "bn1": bn(oracle.b1),
                    "conv2": conv(oracle.c2), "conv3": conv(oracle.c3),
                    "bn2": bn(oracle.b2), "conv4": conv(oracle.c4)},
        "reduce_dim": d(oracle.reduce),
        "cls_token": jnp.asarray(oracle.cls_token.detach().numpy()[0, 0]),
        "cls_pos": jnp.asarray(oracle.cls_pos.detach().numpy()[0, 0]),
        "pos_embed": {"fc1": d(oracle.pe1), "fc2": d(oracle.pe2)},
        "blocks": {
            "ln1": stack(lambda m: ln(m["n1"])),
            "qkv": stack(lambda m: d(m["qkv"])),
            "proj": stack(lambda m: d(m["proj"])),
            "ln2": stack(lambda m: ln(m["n2"])),
            "fc1": stack(lambda m: d(m["f1"])),
            "fc2": stack(lambda m: d(m["f2"])),
        },
        "norm": ln(oracle.norm),
    }

    rs = np.random.RandomState(3)
    pts = rs.randn(2, 64, 6).astype(np.float32)
    neigh, center = group_points(jnp.asarray(pts), cfg)
    with torch.no_grad():
        want = oracle(torch.from_numpy(np.asarray(neigh)),
                      torch.from_numpy(np.asarray(center))).numpy()
    got = point_bert_features(params, cfg, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


@pytest.mark.slow
def test_point_tower_shapes():
    tower = PointBertTower("test:16x2")
    pts = np.random.RandomState(0).randn(2, 64, 6).astype(np.float32)
    out = tower.encode(pts)
    assert out.shape == (2, 9, 16)  # 8 groups + CLS
    assert tower.feature_len == 9


def test_point_processor_norm():
    pc = np.random.RandomState(0).randn(100, 6).astype(np.float32) * 5 + 3
    normed = PointCloudProcessor.pc_norm(pc)
    assert abs(normed[:, :3].mean()) < 1e-5
    assert abs(np.linalg.norm(normed[:, :3], axis=1).max() - 1) < 1e-5
    np.testing.assert_allclose(normed[:, 3:], pc[:, 3:])


# ----------------------------------------------------------------- video

def test_video_tower_shapes():
    tower = LanguageBindVideoTower("test:32x3")
    vid = np.random.RandomState(0).rand(1, 2, 28, 28, 3).astype(np.float32)
    out = tower.encode(vid)
    # 28/14 = 2x2 patches + CLS = 5 tokens, hidden 32, select -2 of 3 layers
    assert out.shape == (1, 2, 5, 32)
    assert tower.feature_len == 2 * 5


def test_video_temporal_attention_mixes_frames():
    cfg = LanguageBindVideoConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2,
                                  num_attention_heads=4, image_size=28,
                                  patch_size=14, num_frames=2,
                                  select_layer=-1)
    params = init_languagebind_video(cfg, jax.random.PRNGKey(0))
    # make temporal attention params non-trivial
    key = jax.random.PRNGKey(5)
    lp = params["layers"]
    for name in ("t_q", "t_k", "t_v", "t_o"):
        key, sub = jax.random.split(key)
        lp[name]["w"] = jax.random.normal(sub, lp[name]["w"].shape) * 0.2

    vid = np.random.RandomState(0).rand(1, 2, 28, 28, 3).astype(np.float32)
    out1 = languagebind_video_features(params, cfg, jnp.asarray(vid))
    # perturbing frame 1 must change frame 0's features (cross-frame mixing)
    vid2 = vid.copy()
    vid2[0, 1] += 0.5
    out2 = languagebind_video_features(params, cfg, jnp.asarray(vid2))
    delta_frame0 = float(jnp.abs(out1[0, 0] - out2[0, 0]).max())
    assert delta_frame0 > 1e-5, "temporal attention is not mixing frames"


def test_video_processor_uniform_sampling():
    from modelcompose_tpu.data.video_processing import (
        LanguageBindVideoProcessor, uniform_frame_indices)
    np.testing.assert_array_equal(uniform_frame_indices(16, 8),
                                  [0, 2, 4, 6, 8, 10, 12, 15])
    proc = LanguageBindVideoProcessor(num_frames=2, size=28)
    vid = (np.random.RandomState(0).rand(10, 40, 50, 3) * 255).astype(
        np.uint8)
    out = proc(vid)
    assert out.shape == (1, 2, 28, 28, 3)
