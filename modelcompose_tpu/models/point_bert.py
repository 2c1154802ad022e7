"""PointBERT point-cloud encoder (PointTransformer) in JAX.

Rebuild of the reference's vendored PointBERT v1.2 (reference:
modelcompose/model/multimodal_encoder/pointbert/point_encoder.py:101-186 and
pointbert/dvae.py:143-224, config PointTransformer_8192point_2layer.yaml with
``point_dims`` forced to 6 xyzrgb — point_encoder.py:29):

  8192x6 points -> FPS to 512 group centers -> 32-NN neighborhoods (xyz
  centered on the center, rgb appended) -> mini-PointNet group encoder
  (1x1 convs + batchnorm running stats + two max-pools, 6->256) ->
  reduce_dim to 384 -> [CLS] + 512 tokens through a 12-layer pre-LN ViT
  whose positional MLP(3->128->gelu->384) of the center coords is re-added
  at EVERY block (reference: point_encoder.py:96-99) -> final LayerNorm ->
  [B, 513, 384].

The reference's FPS seeds from a random point (misc.py:52) — here the start
index defaults to 0 so eval is deterministic.  FPS runs as a
``lax.fori_loop`` argmax iteration; KNN is a top-k over squared distances.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PointBertConfig:
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256
    point_dims: int = 6
    npoints: int = 8192
    mlp_ratio: float = 4.0
    use_max_pool: bool = False

    @property
    def hidden_size(self) -> int:
        return self.trans_dim * 2 if self.use_max_pool else self.trans_dim


# ---------------------------------------------------------------------------
# Grouping (FPS + KNN), reference: pointbert/misc.py:40-63, dvae.py:107-118
# ---------------------------------------------------------------------------

def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          start_index: int = 0) -> jnp.ndarray:
    """xyz: [B, N, 3] -> [B, npoint] int32 indices."""
    B, N, _ = xyz.shape

    def body(i, state):
        centroids, distance, farthest = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1)      # [B, 1, 3]
        dist = ((xyz - centroid) ** 2).sum(-1)          # [B, N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids = jnp.zeros((B, npoint), jnp.int32)
    distance = jnp.full((B, N), 1e10, jnp.float32)
    farthest = jnp.full((B,), start_index, jnp.int32)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body,
                                        (centroids, distance, farthest))
    return centroids


def knn_point(nsample: int, xyz: jnp.ndarray,
              new_xyz: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, S, 3] -> [B, S, nsample] nearest-point indices."""
    sqr = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    _, idx = jax.lax.top_k(-sqr, nsample)
    return idx


def group_points(points: jnp.ndarray, cfg: PointBertConfig,
                 start_index: int = 0):
    """points: [B, N, C>=3] -> (neighborhood [B, G, M, C], centers [B, G, 3])
    with xyz centered per group (reference: dvae.py:150-187)."""
    xyz = points[..., :3]
    rest = points[..., 3:]
    fps_idx = farthest_point_sample(xyz, cfg.num_group, start_index)
    center = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
    idx = knn_point(cfg.group_size, xyz, center)        # [B, G, M]
    B, G, M = idx.shape

    def gather(src):
        return jnp.take_along_axis(
            src[:, None].repeat(G, axis=1), idx[..., None].repeat(
                src.shape[-1], axis=-1), axis=2)

    n_xyz = gather(xyz) - center[:, :, None, :]
    if rest.shape[-1]:
        n_rest = gather(rest)
        neighborhood = jnp.concatenate([n_xyz, n_rest], axis=-1)
    else:
        neighborhood = n_xyz
    return neighborhood, center


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _dense(p, x):
    return (jnp.einsum("...i,io->...o", x, p["w"],
                       preferred_element_type=jnp.float32)
            + p["b"]).astype(x.dtype)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _bn(p, x, eps=1e-5):
    """BatchNorm in eval mode: running stats folded per channel."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def init_point_bert(cfg: PointBertConfig, rng,
                    dtype=jnp.float32) -> Dict[str, Any]:
    D = cfg.trans_dim
    E = cfg.encoder_dims
    L = cfg.depth
    I = int(D * cfg.mlp_ratio)
    keys = iter(jax.random.split(rng, 32))

    def dense(d_in, d_out, std=0.02):
        return {"w": (jax.random.normal(next(keys), (d_in, d_out),
                                        jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((d_out,), dtype)}

    def stacked(d_in, d_out, std=0.02):
        return {"w": (jax.random.normal(next(keys), (L, d_in, d_out),
                                        jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    def stacked_ln(d):
        return {"scale": jnp.ones((L, d), dtype),
                "bias": jnp.zeros((L, d), dtype)}

    def bn(d):
        return {"scale": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype),
                "mean": jnp.zeros((d,), dtype),
                "var": jnp.ones((d,), dtype)}

    return {
        "encoder": {
            "conv1": dense(cfg.point_dims, 128),
            "bn1": bn(128),
            "conv2": dense(128, 256),
            "conv3": dense(512, 512),
            "bn2": bn(512),
            "conv4": dense(512, E),
        },
        "reduce_dim": dense(E, D),
        "cls_token": jnp.zeros((D,), dtype),
        "cls_pos": (jax.random.normal(next(keys), (D,), jnp.float32)
                    ).astype(dtype),
        "pos_embed": {"fc1": dense(3, 128), "fc2": dense(128, D)},
        "blocks": {
            "ln1": stacked_ln(D),
            "qkv": stacked(D, 3 * D),
            "proj": stacked(D, D),
            "ln2": stacked_ln(D),
            "fc1": stacked(D, I),
            "fc2": stacked(I, D),
        },
        "norm": {"scale": jnp.ones((D,), dtype),
                 "bias": jnp.zeros((D,), dtype)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _mini_pointnet(enc, groups):
    """groups: [B, G, M, C] -> [B, G, encoder_dims]
    (reference: dvae.py:209-223)."""
    B, G, M, C = groups.shape
    x = groups.reshape(B * G, M, C)
    f = jax.nn.relu(_bn(enc["bn1"], _dense(enc["conv1"], x)))
    f = _dense(enc["conv2"], f)                       # [BG, M, 256]
    g = f.max(axis=1, keepdims=True)                  # [BG, 1, 256]
    f = jnp.concatenate([jnp.broadcast_to(g, f.shape), f], axis=-1)
    f = jax.nn.relu(_bn(enc["bn2"], _dense(enc["conv3"], f)))
    f = _dense(enc["conv4"], f)
    return f.max(axis=1).reshape(B, G, -1)


def point_bert_features(params: Dict[str, Any], cfg: PointBertConfig,
                        points: jnp.ndarray,
                        fps_start_index: int = 0) -> jnp.ndarray:
    """points: [B, N, point_dims] -> [B, num_group+1, trans_dim]."""
    neighborhood, center = group_points(points, cfg, fps_start_index)
    tokens = _mini_pointnet(params["encoder"], neighborhood)
    tokens = _dense(params["reduce_dim"], tokens)     # [B, G, D]
    B, G, D = tokens.shape
    cls = jnp.broadcast_to(params["cls_token"][None, None], (B, 1, D))
    cls_pos = jnp.broadcast_to(params["cls_pos"][None, None], (B, 1, D))
    pos = _dense(params["pos_embed"]["fc2"],
                 jax.nn.gelu(_dense(params["pos_embed"]["fc1"], center),
                             approximate=False))
    x = jnp.concatenate([cls, tokens], axis=1)
    pos = jnp.concatenate([cls_pos, pos], axis=1)

    nh = cfg.num_heads
    hd = cfg.trans_dim // nh

    def block(x, bp):
        # pos re-added every block (reference: point_encoder.py:96-99)
        x = x + pos
        h = _ln(bp["ln1"], x)
        qkv = _dense(bp["qkv"], h).reshape(B, -1, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) \
            * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        x = x + _dense(bp["proj"], ctx.reshape(B, -1, nh * hd)
                       .astype(x.dtype))
        h = _ln(bp["ln2"], x)
        h = jax.nn.gelu(_dense(bp["fc1"], h), approximate=False)
        x = x + _dense(bp["fc2"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = _ln(params["norm"], x)
    if cfg.use_max_pool:
        pooled = jnp.concatenate([x[:, 0], x[:, 1:].max(axis=1)], axis=-1)
        return pooled[:, None, :]
    return x


# ---------------------------------------------------------------------------
# Checkpoint conversion (PointBERT v1.2 torch layout)
# ---------------------------------------------------------------------------

def convert_point_bert(state: Dict[str, np.ndarray], cfg: PointBertConfig,
                       dtype=jnp.float32) -> Dict[str, Any]:
    def g(k):
        return np.asarray(state[k], np.float32)

    L = cfg.depth

    def conv1x1(prefix):
        # torch Conv1d weight [out, in, 1] -> [in, out]
        return {"w": g(f"{prefix}.weight")[..., 0].T,
                "b": g(f"{prefix}.bias")}

    def bn(prefix):
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias"),
                "mean": g(f"{prefix}.running_mean"),
                "var": g(f"{prefix}.running_var")}

    def bias_or_zero(prefix, d_out):
        # PointBERT's ViT blocks use qkv_bias=False (reference:
        # pointbert/point_encoder.py:38) — zero-fill missing biases
        key = f"{prefix}.bias"
        return g(key) if key in state else np.zeros(d_out, np.float32)

    def dense(prefix):
        w = g(f"{prefix}.weight")
        return {"w": w.T, "b": bias_or_zero(prefix, w.shape[0])}

    def stack_dense(fmt):
        ws = [g(fmt.format(i=i) + ".weight") for i in range(L)]
        return {"w": np.stack([w.T for w in ws]),
                "b": np.stack([bias_or_zero(fmt.format(i=i), ws[i].shape[0])
                               for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i=i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i=i) + ".bias")
                                  for i in range(L)])}

    params = {
        "encoder": {
            "conv1": conv1x1("encoder.first_conv.0"),
            "bn1": bn("encoder.first_conv.1"),
            "conv2": conv1x1("encoder.first_conv.3"),
            "conv3": conv1x1("encoder.second_conv.0"),
            "bn2": bn("encoder.second_conv.1"),
            "conv4": conv1x1("encoder.second_conv.3"),
        },
        "reduce_dim": dense("reduce_dim"),
        "cls_token": g("cls_token")[0, 0],
        "cls_pos": g("cls_pos")[0, 0],
        "pos_embed": {"fc1": dense("pos_embed.0"),
                      "fc2": dense("pos_embed.2")},
        "blocks": {
            "ln1": stack_ln("blocks.blocks.{i}.norm1"),
            "qkv": stack_dense("blocks.blocks.{i}.attn.qkv"),
            "proj": stack_dense("blocks.blocks.{i}.attn.proj"),
            "ln2": stack_ln("blocks.blocks.{i}.norm2"),
            "fc1": stack_dense("blocks.blocks.{i}.mlp.fc1"),
            "fc2": stack_dense("blocks.blocks.{i}.mlp.fc2"),
        },
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# ---------------------------------------------------------------------------
# Tower wrapper + processor
# ---------------------------------------------------------------------------

class PointCloudProcessor:
    """npy path(s) [N, C] -> [B, N, C] float32 (reference:
    point_encoder.py:88-99)."""

    def __call__(self, pc_files):
        if isinstance(pc_files, (str, np.ndarray)):
            pc_files = [pc_files]
        arrays = [np.load(p) if isinstance(p, str) else np.asarray(p)
                  for p in pc_files]
        return np.stack(arrays).astype(np.float32)

    @staticmethod
    def pc_norm(pc: np.ndarray) -> np.ndarray:
        """Unit-sphere normalization.  NOT applied in the data path — the
        reference's processor also just loads + stacks (point_encoder.py:
        88-99; its pc_norm at :101 is equally uncalled) because the
        released 8192_npy clouds are pre-normalized.  Kept as the same
        user-facing utility for raw clouds."""
        xyz, rest = pc[:, :3], pc[:, 3:]
        xyz = xyz - xyz.mean(axis=0)
        m = np.sqrt((xyz ** 2).sum(axis=1)).max()
        return np.concatenate([xyz / m, rest], axis=1)


class PointBertTower:
    modality = "point"

    def __init__(self, spec: str, model_cfg=None, rng=None, params=None,
                 dtype=None):
        import os
        if isinstance(spec, str) and spec.startswith("test:"):
            h, l = spec.split(":")[1].split("x")
            self.cfg = PointBertConfig(trans_dim=int(h), depth=int(l),
                                       num_heads=2, group_size=4,
                                       num_group=8, encoder_dims=16,
                                       npoints=64)
        else:
            self.cfg = PointBertConfig()
        self.spec = spec
        self.params = params
        if self.params is None:
            if isinstance(spec, str) and os.path.isfile(spec):
                self.load_model()
            else:
                self.params = init_point_bert(
                    self.cfg,
                    rng if rng is not None else jax.random.PRNGKey(0),
                    dtype or jnp.float32)
        self._encode = jax.jit(functools.partial(point_bert_features,
                                                 cfg=self.cfg))

    def load_model(self):
        import torch
        ckpt = torch.load(self.spec, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt)
        state = {k.replace("module.point_encoder.", ""): v.float().numpy()
                 for k, v in state.items()}
        self.params = convert_point_bert(state, self.cfg)

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def feature_len(self) -> int:
        return 1 if self.cfg.use_max_pool else self.cfg.num_group + 1

    @property
    def dummy_inputs(self) -> np.ndarray:
        return np.zeros((1, self.cfg.npoints, self.cfg.point_dims),
                        np.float32)

    @property
    def modal_processor(self):
        return PointCloudProcessor()

    def encode(self, points) -> jnp.ndarray:
        return self._encode(self.params, points=jnp.asarray(points))

    def __call__(self, points):
        return self.encode(points)
