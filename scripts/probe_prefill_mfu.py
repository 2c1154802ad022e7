"""Prefill-MFU gap probes at the composed 3328-bucket geometry (round-5
VERDICT #7: 0.647 -> >=0.70, probe-first).

The remaining gap decomposition (BASELINE.md): int8 dequant share,
attention/norm overhead, ~1.2% padding.  Per the repo's negative-result
discipline, each candidate is priced in isolation BEFORE any integration:

probe A (dequant share): one decoder layer's full matmul chain
  (q/k/v/o/gate/up/down) at [3328, ...] — int8 dequant-matmul
  (production) vs bf16 weights, 32-layer scan with a data dependency so
  nothing CSEs away.  The delta, x32 layers, bounds what a bf16-staged
  prefill or a fused pallas dequant-matmul could recover end-to-end.

probe B (flash block retune): the pallas flash fwd kernel at the
  composed shape (B=1, H=32, L=3328, D=128, causal) across blk_q x blk_k
  candidates vs the shipped (256, 512) default.

Prints one JSON line per probe; paste results into BASELINE.md.
Run: timeout 590 python scripts/probe_prefill_mfu.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

L = int(os.environ.get("MC_PROBE_L", "3328"))  # composed MCUB-4 bucket
H, KV, I = 4096, 4096, 11008
N_LAYERS = 32


def _enable_compile_cache():
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()


def probe_dequant_share():
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.ops.quant import dequant_matmul, quantize_int8

    rs = np.random.RandomState(0)

    def mk(shape):
        return jnp.asarray(rs.rand(*shape).astype(np.float32) * 0.02,
                           jnp.bfloat16)

    w_bf16 = {"q": mk((H, H)), "k": mk((H, KV)), "v": mk((H, KV)),
              "o": mk((H, H)), "gate": mk((H, I)), "up": mk((H, I)),
              "down": mk((I, H))}
    w_int8 = {k: quantize_int8(v) for k, v in w_bf16.items()}
    x0 = mk((L, H))

    def layer_chain(x, w, mm):
        q = mm(x, w["q"])
        k = mm(x, w["k"])
        v = mm(x, w["v"])
        # stand-in mix keeps q/k/v live without attention flops
        a = q + 0.001 * (k + v)
        o = mm(a, w["o"])
        g = mm(o, w["gate"])
        u = mm(o, w["up"])
        m = (jax.nn.silu(g) * u).astype(x.dtype)
        return (x + mm(m, w["down"])).astype(x.dtype)

    def bf16_mm(x, w):
        return jnp.einsum("li,io->lo", x, w,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    # weights are traced ARGUMENTS, not closure captures — captured trees
    # embed as HLO constants and the relay compile dies with HTTP 413
    @jax.jit
    def run_bf16(x, w):
        def body(h, _):
            return layer_chain(h, w, bf16_mm), None
        h, _ = jax.lax.scan(body, x, None, length=N_LAYERS)
        return h

    @jax.jit
    def run_int8(x, w):
        def body(h, _):
            return layer_chain(h, w, dequant_matmul), None
        h, _ = jax.lax.scan(body, x, None, length=N_LAYERS)
        return h

    # matmul flops of the chain, per layer
    flops = 2 * L * (H * H * 2 + H * KV * 2 + H * I * 2 + I * H) * N_LAYERS

    out = {"probe": "dequant_share", "L": L, "layers": N_LAYERS}
    for name, fn, w in [("bf16", run_bf16, w_bf16),
                        ("int8", run_int8, w_int8)]:
        r = fn(x0, w)
        np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync (relay gotcha)
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(r, w)  # data dependency across iterations
        np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync (relay gotcha)
        dt = (time.perf_counter() - t0) / iters
        out[name] = {"ms": round(dt * 1e3, 1),
                     "tflops": round(flops / dt / 1e12, 1),
                     "mfu": round(flops / dt / 197e12, 3)}
    out["int8_overhead_pct"] = round(
        100 * (out["int8"]["ms"] / out["bf16"]["ms"] - 1), 1)
    return out


def probe_flash_blocks():
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.ops.flash_attention import _flash_attention_forward

    rs = np.random.RandomState(0)
    B, NH, D = 1, 32, 128
    q = jnp.asarray(rs.rand(B, NH, L, D).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rs.rand(B, NH, L, D).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rs.rand(B, NH, L, D).astype(np.float32), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)

    flops = 2 * 2 * (L * L // 2) * D * NH  # causal QK^T + PV
    out = {"probe": "flash_blocks", "L": L, "heads": NH}
    results = {}
    cand = os.environ.get("MC_PROBE_BLOCKS", "")
    if cand:
        pairs = [tuple(int(x) for x in c.split("x"))
                 for c in cand.split(",") if c]
    else:
        pairs = [(256, 512), (512, 512), (256, 1024), (512, 1024),
                 (128, 512), (256, 256), (512, 2048),
                 (1024, 1024), (1024, 512), (768, 1024), (512, 1536)]
    for blk_q, blk_k in pairs:
        fn = jax.jit(functools.partial(
            _flash_attention_forward, sm_scale=D ** -0.5, causal=True,
            q_offset=0, blk_q=blk_q, blk_k=blk_k))
        try:
            r, _ = fn(q, k, v, seg, seg)
            np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync (relay gotcha)
            iters = 16
            t0 = time.perf_counter()
            for _ in range(iters):
                r, _ = fn(q, k, v, seg, seg)
            np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync (relay gotcha)
            dt = (time.perf_counter() - t0) / iters
            results[f"{blk_q}x{blk_k}"] = {
                "ms": round(dt * 1e3, 2),
                "tflops": round(flops / dt / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            results[f"{blk_q}x{blk_k}"] = {"error": str(e)[:120]}
        print(f"# {blk_q}x{blk_k}: {results[f'{blk_q}x{blk_k}']}",
              flush=True)
    out["blocks"] = results
    return out


def probe_flash_bwd_blocks():
    """Backward (dq + dkv) tile probe — the train step executes ~2.5x the
    forward's attention flops in these kernels, and their (256, 512)
    default was never tuned.  Times the full custom-vjp backward at the
    train geometry via jax.grad."""
    import jax
    import jax.numpy as jnp
    import importlib
    # NOT `from modelcompose_tpu.ops import flash_attention`: the package
    # re-exports the flash_attention FUNCTION, shadowing the submodule.
    fa = importlib.import_module("modelcompose_tpu.ops.flash_attention")

    rs = np.random.RandomState(0)
    B, NH, D = int(os.environ.get("MC_PROBE_B", "2")), 32, 128
    Lb = int(os.environ.get("MC_PROBE_BWD_L", "2048"))  # train ctx
    q = jnp.asarray(rs.rand(B, NH, Lb, D).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rs.rand(B, NH, Lb, D).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rs.rand(B, NH, Lb, D).astype(np.float32), jnp.bfloat16)
    seg = jnp.ones((B, Lb), jnp.int32)
    do = jnp.asarray(rs.rand(B, NH, Lb, D).astype(np.float32), jnp.bfloat16)

    # fwd residuals once (not timed)
    out, lse = fa._flash_attention_forward(
        q, k, v, seg, seg, sm_scale=D ** -0.5, causal=True, q_offset=0)

    # dq: 2 dots/block (dp, dq) + dkv: 3 dots/block (dv, dp, dk), each
    # 2*(L^2/2)*D*NH causal flops per dot pairing with the s recompute
    # (1 dot each) -> 7 block-dots total vs the fwd's 2
    flops = 7 * (Lb * Lb // 2) * 2 * D * NH * B
    out_js = {"probe": "flash_bwd_blocks", "L": Lb, "B": B}
    results = {}
    cand = os.environ.get("MC_PROBE_BWD_BLOCKS",
                          "256x512,512x512,512x1024,256x1024,128x512")
    pairs = [tuple(int(x) for x in c.split("x")) for c in cand.split(",")
             if c]
    for blk_q, blk_k in pairs:
        fn = jax.jit(functools.partial(
            fa._flash_attention_backward, sm_scale=D ** -0.5, causal=True,
            q_offset=0, blk_q=blk_q, blk_k=blk_k))
        try:
            r = fn(q, k, v, out, lse, do, seg, seg)
            np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(q, k, v, out, lse, do, seg, seg)
            np.asarray(jax.tree.leaves(r)[0][..., :8])  # D2H sync
            dt = (time.perf_counter() - t0) / iters
            results[f"{blk_q}x{blk_k}"] = {
                "ms": round(dt * 1e3, 2),
                "tflops": round(flops / dt / 1e12, 1)}
        except Exception as e:  # noqa: BLE001
            results[f"{blk_q}x{blk_k}"] = {"error": str(e)[:120]}
        print(f"# bwd {blk_q}x{blk_k}: {results[f'{blk_q}x{blk_k}']}",
              flush=True)
    out_js["blocks"] = results
    return out_js


def main():
    _enable_compile_cache()
    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    which = os.environ.get("MC_PROBE", "")
    if which in ("", "dequant"):
        print(json.dumps(probe_dequant_share()), flush=True)
    if which in ("", "flash"):
        print(json.dumps(probe_flash_blocks()), flush=True)
    if which in ("flashbwd",):
        print(json.dumps(probe_flash_bwd_blocks()), flush=True)


if __name__ == "__main__":
    main()
