"""Microbench: per-window attention dot cost, bf16 vs int8 MXU (v5e).

The fused swin block kernel is weight-load bound on the per-window
attention dots (~500 cycles/window at C=96, docs/performance.md).  v5e's
MXU runs int8 at 2x bf16 throughput — this measures whether Mosaic int8
dots actually realize that on the headpack shapes, before committing to a
quantized kernel.

Usage: python tools/microbench_int8_attn.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_bf16(q_ref, khat_ref, vhat_ref, out_ref):
    # headpack shapes per window: scores (N=36, C=96)@(96, P=216),
    # out (36, 216)@(216, 102)
    q = q_ref[:]
    scores = jax.lax.dot_general(
        q, khat_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    e = jnp.exp2(jnp.maximum(scores - jnp.max(scores, -1, keepdims=True),
                             -100.0)).astype(q.dtype)
    out = jax.lax.dot_general(
        e, vhat_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = out[:, :, :96].astype(out_ref.dtype)


def _kernel_int8(q_ref, khat_ref, vhat_ref, out_ref):
    q = q_ref[:]
    scores_i = jax.lax.dot_general(
        q, khat_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    scores = scores_i.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    e = jnp.exp2(jnp.maximum(scores - jnp.max(scores, -1, keepdims=True),
                             -100.0))
    ei = jnp.round(e * 127.0).astype(jnp.int8)
    out_i = jax.lax.dot_general(
        ei, vhat_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    out_ref[:] = (out_i[:, :, :96].astype(jnp.float32)
                  * (1.0 / (127.0 * 127.0))).astype(out_ref.dtype)


def bench(kernel, dtype, out_dtype, nw=14720, bw=16, label=""):
    N, C, P = 36, 96, 216
    # generate ON DEVICE — these arrays are GBs and the harness h2d tunnel
    # is ~32 MB/s
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        mk = lambda k, shape: jax.random.randint(  # noqa: E731
            k, shape, -127, 127, jnp.int32).astype(jnp.int8)
    else:
        mk = lambda k, shape: jax.random.uniform(  # noqa: E731
            k, shape, dtype=jnp.float32, minval=-1, maxval=1).astype(dtype)
    k1, k2, k3 = jax.random.split(key, 3)
    q = mk(k1, (nw, N, C))
    khat = mk(k2, (nw, C, P))
    vhat = mk(k3, (nw, P, C + 8))

    grid = (nw // bw,)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bw, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, C, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, P, C + 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bw, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, N, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    fj = jax.jit(f)
    # block_until_ready is not a reliable sync on the remote axon platform;
    # a scalar readback is (it's how bench.py syncs)
    cksum = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    y = fj(q, khat, vhat)
    _ = float(cksum(y))
    for iters in (2, 8):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(iters):
            s = s + cksum(fj(q, khat, vhat))
        _ = float(s)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:24s} iters={iters}: {dt*1000:8.2f} ms  "
              f"({dt/nw*1e9:6.0f} ns/window)")
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    # full-res layer window count for 1104x1920 grid
    bench(_kernel_bf16, jnp.bfloat16, jnp.bfloat16, label="bf16 headpack dots")
    bench(_kernel_int8, jnp.int8, jnp.bfloat16, label="int8 headpack dots")
