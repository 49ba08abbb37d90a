"""Microbench: swin block-edge relayout strategies at full-res 1080p shapes.

Current orchestration pays one fused XLA copy per block edge
(reverse+unroll then roll+partition). Candidates:
  A) baseline: token->image->rolled-token (what SwinTransformerBlocks does)
  B) quadrant regroup: stay in token layout, shifted windows built from
     4 rolled quadrant slices (pure concat, no image round trip)
  C) image roundtrip without roll (shift=0 edge)
Usage: python -u tools/microbench_layout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W, C, ws, sh = 1104, 1920, 96, 6, 3
nh, nw = H // ws, W // ws


def t2i(xw):
    x = xw.reshape(1, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(1, H, W, C)


def i2t(x, shift):
    if shift:
        x = jnp.roll(x, (-sh, -sh), axis=(1, 2))
    xw = x.reshape(1, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(nh * nw, ws * ws, C)


@jax.jit
def edge_baseline(xw):
    # token -> image -> shifted token (one block edge, shift on)
    return i2t(t2i(xw), True) * 1.000001


@jax.jit
def edge_quadrant(xw):
    # shifted window rows 0-2 = rows 3-5 of same window; rows 3-5 = rows
    # 0-2 of the next window down (rolled). Same for columns.
    x6 = xw.reshape(1, nh, nw, ws, ws, C)
    lo = x6[:, :, :, sh:, :, :]                       # (1,nh,nw,3,6,C)
    hi = jnp.roll(x6, -1, axis=1)[:, :, :, :sh, :, :]
    v = jnp.concatenate([lo, hi], axis=3)             # rows shifted
    l2 = v[:, :, :, :, sh:, :]
    h2 = jnp.roll(v, -1, axis=2)[:, :, :, :, :sh, :]
    out = jnp.concatenate([l2, h2], axis=4)
    return out.reshape(nh * nw, ws * ws, C) * 1.000001


@jax.jit
def edge_noshift(xw):
    return i2t(t2i(xw), False) * 1.000001


def bench(fn, xw, n=20):
    r = fn(xw)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    s = None
    for _ in range(n):
        s = jnp.sum(fn(xw).astype(jnp.float32))
    _ = float(s)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.normal(size=(nh * nw, ws * ws, C)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    # correctness: quadrant == baseline
    a = np.asarray(edge_baseline(xw).astype(jnp.float32))
    b = np.asarray(edge_quadrant(xw).astype(jnp.float32))
    print("quadrant == baseline:", np.array_equal(a, b), flush=True)
    for name, fn in [("baseline(shift)", edge_baseline),
                     ("quadrant(shift)", edge_quadrant),
                     ("noshift", edge_noshift)]:
        print(f"{name}: {bench(fn, xw):.2f} ms/edge", flush=True)


if __name__ == "__main__":
    main()
