"""Piece-wise microbench of the fused swin block kernel at frame shapes.

Builds the kernel's computation incrementally so each piece's cost is a
measured delta (fori-loop slope, readback-synced — the axon methodology):

  P0  windowing + dense matmuls (qkv/proj/fc1+gelu/fc2 + residuals)
  P1  P0 + khat/vhat construction (tile+mask VPU passes)
  P2  P1 + packed scores dot (q @ khat)
  P3  P2 + softmax VPU (bias add + clamp + exp2 + cast)
  P4  full kernel (PV dot + denominator broadcast + divide)

int8 variants quantify the v5e 2x int8 MXU rate at the REAL shapes:
  P0q dense matmuls int8 (W8A8: per-row activation quant in VMEM,
      per-channel weight scales)
  P4q full kernel with int8 dense matmuls
  P4s full kernel with int8 scores dot (q/khat quantized per block)

Usage: python -u tools/microbench_swin_pieces.py [C] [G] [pieces...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

LOG2E = 1.4426950408889634


def _quant_rows(x):
    """Per-row symmetric int8 quantization: returns (xq, amax/127)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    amax = jnp.maximum(amax, 1e-6)
    r = 127.0 / amax
    xq = jnp.round(x.astype(jnp.float32) * r).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def _dense(xt, w_ref, b_ref, *, int8, wscale_ref=None):
    if not int8:
        y = jax.lax.dot_general(
            xt, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + b_ref[:][None].astype(jnp.float32)
    xq, xs = _quant_rows(xt)
    yi = jax.lax.dot_general(
        xq, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = yi.astype(jnp.float32) * xs * wscale_ref[:][None]
    return y + b_ref[:][None].astype(jnp.float32)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, bias_ref,
            sqkv_ref, sproj_ref, sfc1_ref, sfc2_ref,
            out_ref, *, C, heads, G, rh, cw, pieces, dense_int8,
            scores_int8):
    ws = 6
    N = 36
    hd = C // heads
    x = x_ref[0]                                     # (rh*ws, cw*ws, C)
    xw = x.reshape(rh, ws, cw, ws, C).transpose(0, 2, 1, 3, 4)
    xw = xw.reshape(rh * cw, N, C)
    BW = rh * cw
    xt = xw.reshape(BW * N, C)
    dt = x.dtype

    if pieces < 0:  # windowing-only probe (no matmuls at all)
        y = (xw * 1.0001).reshape(rh, cw, ws, ws, C).transpose(0, 2, 1, 3, 4)
        out_ref[0] = y.reshape(rh * ws, cw * ws, C)
        return

    qkv = _dense(xt, wqkv_ref, bqkv_ref, int8=dense_int8,
                 wscale_ref=sqkv_ref).astype(dt)
    qkv = qkv.reshape(BW // G, G * N, 3 * C)
    nb, NG, _ = qkv.shape
    P = heads * NG

    if pieces >= 1:
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 1) // hd
        row_head = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) // NG
        hmask = (lane_head == row_head).astype(dt)
        q = qkv[:, :, :C]
        k = qkv[:, :, C:2 * C]
        v = qkv[:, :, 2 * C:]
        khat = jnp.tile(k, (1, heads, 1)) * hmask[None]
        vhat = jnp.tile(v, (1, heads, 1)) * hmask[None]

    if pieces >= 2:
        scale = jnp.asarray(hd ** -0.5 * LOG2E, dt)
        if scores_int8:
            qq, qs = _quant_rows((q * scale).reshape(nb * NG, C))
            qq = qq.reshape(nb, NG, C)
            kq, ks = _quant_rows(khat.reshape(nb * P, C))
            kq = kq.reshape(nb, P, C)
            si = jax.lax.dot_general(
                qq, kq, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            scores = (si.astype(jnp.float32)
                      * qs.reshape(nb, NG, 1)
                      * ks.reshape(nb, 1, P))
        else:
            scores = jax.lax.dot_general(
                q * scale, khat,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (nb, NG, P)

    if pieces >= 3:
        scores = scores + bias_ref[:][None]
        e = jnp.exp2(jnp.clip(scores, -100.0, 60.0)).astype(dt)

    if pieces >= 4:
        onescols = (jax.lax.broadcasted_iota(jnp.int32, (P, heads), 1)
                    == jax.lax.broadcasted_iota(jnp.int32, (P, heads), 0)
                    // NG).astype(dt)
        vhat_aug = jnp.concatenate(
            [vhat, jnp.broadcast_to(onescols[None], (nb, P, heads))],
            axis=-1)
        out_un = jax.lax.dot_general(
            e, vhat_aug, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        denom = out_un[:, :, C:]
        rmat = (jax.lax.broadcasted_iota(jnp.int32, (heads, C), 1) // hd
                == jax.lax.broadcasted_iota(
                    jnp.int32, (heads, C), 0)).astype(jnp.float32)
        denom_b = jax.lax.dot_general(
            denom, rmat, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn = (out_un[:, :, :C] / denom_b).astype(dt)
    elif pieces == 3:
        attn = (e[:, :, :C] * 0.001).astype(dt)      # consume e
    elif pieces == 2:
        attn = (scores[:, :, :C] * 0.001).astype(dt)  # consume scores
    elif pieces == 1:
        attn = ((khat[:, :NG, :] + vhat[:, :NG, :]) * 0.001).astype(dt)
    else:
        attn = qkv[:, :, :C] * 0.001
    attn = attn.reshape(BW * N, C)

    proj = _dense(attn, wproj_ref, bproj_ref, int8=dense_int8,
                  wscale_ref=sproj_ref)
    y1 = (proj + xt.astype(jnp.float32)).astype(dt)
    h1 = _dense(y1, wfc1_ref, bfc1_ref, int8=dense_int8, wscale_ref=sfc1_ref)
    h1 = jax.nn.sigmoid(1.702 * h1) * h1             # cheap gelu for timing
    h1 = h1.astype(dt)
    h2 = _dense(h1, wfc2_ref, bfc2_ref, int8=dense_int8, wscale_ref=sfc2_ref)
    out = (h2 + y1.astype(jnp.float32)).astype(dt)

    y = out.reshape(rh, cw, ws, ws, C).transpose(0, 2, 1, 3, 4)
    out_ref[0] = y.reshape(rh * ws, cw * ws, C)


def build(C, G, H, W, pieces, dense_int8=False, scores_int8=False,
          rh=None, cw=None):
    heads = C // 16
    ws, N = 6, 36
    rh = rh or int(os.environ.get("BENCH_RH", "1"))
    cw = cw or int(os.environ.get("BENCH_CW", str(max(8, 1536 // C))))
    n_wh, n_ww = H // ws, W // ws
    assert n_ww % cw == 0 and (rh * cw) % G == 0, (n_ww, cw, G)
    hidden = 2 * C
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mkw(i, o):
        w = rng.normal(0, 0.05, (i, o)).astype(np.float32)
        if not dense_int8:
            return jnp.asarray(w, dt), jnp.zeros((o,), jnp.float32)
        s = np.abs(w).max(0) / 127.0
        wq = np.round(w / s[None]).astype(np.int8)
        return jnp.asarray(wq), jnp.asarray(s, jnp.float32)

    wqkv, sqkv = mkw(C, 3 * C)
    wproj, sproj = mkw(C, C)
    wfc1, sfc1 = mkw(C, hidden)
    wfc2, sfc2 = mkw(hidden, C)
    if not dense_int8:
        # placeholders (unused refs still need shapes)
        sqkv = jnp.ones((3 * C,), jnp.float32)
        sproj = jnp.ones((C,), jnp.float32)
        sfc1 = jnp.ones((hidden,), jnp.float32)
        sfc2 = jnp.ones((C,), jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    bproj = jnp.zeros((C,), jnp.float32)
    bfc1 = jnp.zeros((hidden,), jnp.float32)
    bfc2 = jnp.zeros((C,), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.02, (G * N, heads * G * N)),
                       jnp.float32)

    grid = (n_wh, n_ww // cw)
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        functools.partial(_kernel, C=C, heads=heads, G=G, rh=rh, cw=cw,
                          pieces=pieces, dense_int8=dense_int8,
                          scores_int8=scores_int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rh * ws, cw * ws, C), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            wspec(C, 3 * C), wspec(3 * C,), wspec(C, C), wspec(C,),
            wspec(C, hidden), wspec(hidden,), wspec(hidden, C), wspec(C,),
            wspec(G * N, heads * G * N),
            wspec(3 * C,), wspec(C,), wspec(hidden,), wspec(C,),
        ],
        out_specs=pl.BlockSpec((1, rh * ws, cw * ws, C),
                               lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(x):
        return f(x, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2, bias,
                 sqkv, sproj, sfc1, sfc2)
    return step


def bench_step(step, x, label):
    @jax.jit
    def loop(x, k):
        def body(_, x):
            return step(x)
        return jax.lax.fori_loop(0, k, body, x)

    for k in (2, 10):
        _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[0, :8, :8]))

    def run(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[0, :8, :8]))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(10) - run(2)) / 8.0
    print(f"  {label}: {per * 1e3:6.2f} ms/layer", flush=True)
    return per


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    G = int(sys.argv[2]) if len(sys.argv) > 2 else (4 if C == 96 else 2)
    H, W = (1104, 1920) if C == 96 else (552, 960)
    sel = sys.argv[3:] or ["W", "P0", "P2", "P4"]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.5, (1, H, W, C)), jnp.bfloat16)
    print(f"C={C} G={G} H={H} W={W}", flush=True)
    variants = {
        "W": dict(pieces=-1),
        "P0": dict(pieces=0),
        "P1": dict(pieces=1),
        "P2": dict(pieces=2),
        "P3": dict(pieces=3),
        "P4": dict(pieces=4),
        "P0q": dict(pieces=0, dense_int8=True),
        "P4q": dict(pieces=4, dense_int8=True),
        "P4s": dict(pieces=4, scores_int8=True),
        "P4qs": dict(pieces=4, dense_int8=True, scores_int8=True),
    }
    for name in sel:
        step = build(C, G, H, W, **variants[name])
        bench_step(step, x, name)


if __name__ == "__main__":
    main()
