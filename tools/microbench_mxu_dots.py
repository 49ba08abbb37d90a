"""Isolate per-window attention dot cost on the MXU: bf16 vs int8, with
shape/padding variants.  Each kernel repeats the dot pair REPS times over
VMEM-resident operands inside one pallas_call (a fori_loop with a data
dependency), so dispatch/HBM noise is amortized away and the time is pure
MXU issue cost.

Usage: python tools/microbench_mxu_dots.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64
BW = 16  # windows per grid step


def _mk_kernel(N, C, P, dtype, acc):
    def kernel(q_ref, khat_ref, vhat_ref, out_ref):
        def body(i, carry):
            # data dependency injected in int32/f32 space (Mosaic has no
            # int8 VPU arith; i8 vectors may only feed the MXU)
            q = q_ref[:]
            scores = jax.lax.dot_general(
                q, khat_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc)
            if dtype == jnp.int8:
                e = ((scores + carry.astype(jnp.int32)) >> 7).astype(jnp.int8)
            else:
                e = (scores + carry).astype(dtype)
            o = jax.lax.dot_general(
                e, vhat_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=acc)
            red = o[0, 0, 0].astype(jnp.float32)
            return carry * 0 + red * 1e-30
        r = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        out_ref[:] = jnp.full((8, 128), r, jnp.float32)
    return kernel


def bench(label, N, C, P, dtype, nwin=1024):
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    if dtype == jnp.int8:
        mk = lambda k, s: jax.random.randint(k, s, -127, 127, jnp.int32  # noqa
                                             ).astype(jnp.int8)
    else:
        mk = lambda k, s: jax.random.uniform(k, s, jnp.float32).astype(dtype)  # noqa
    q = mk(kq, (nwin, N, C))
    khat = mk(kk, (nwin, C, P))
    vhat = mk(kv, (nwin, P, C))

    grid = (nwin // BW,)
    f = pl.pallas_call(
        _mk_kernel(N, C, P, dtype, acc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BW, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, C, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, P, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    fj = jax.jit(f)
    cks = jax.jit(lambda a: jnp.sum(a))
    _ = float(cks(fj(q, khat, vhat)))
    t0 = time.perf_counter()
    _ = float(cks(fj(q, khat, vhat)))
    dt = time.perf_counter() - t0
    per_dotpair = dt / (REPS * nwin // BW) / BW
    cyc = per_dotpair * 0.94e9
    print(f"{label:44s} {per_dotpair*1e9:8.0f} ns/window-dotpair "
          f"(~{cyc:5.0f} cyc)")


if __name__ == "__main__":
    sel = set(int(a) for a in sys.argv[1:]) or None
    print(f"device: {jax.devices()[0].device_kind}, reps={REPS}, bw={BW}")
    # production headpack shapes (heads folded into P)
    if sel is None or 0 in sel:
        bench("bf16  N=36 C=96 P=216 (headpack)", 36, 96, 216, jnp.bfloat16)
    if sel is None or 1 in sel:
        bench("int8  N=36 C=96 P=216 (headpack)", 36, 96, 216, jnp.int8)
    # lane-aligned padding variants
    if sel is None or 2 in sel:
        bench("bf16  N=36 C=128 P=256 (padded)", 36, 128, 256, jnp.bfloat16)
    if sel is None or 3 in sel:
        bench("int8  N=36 C=128 P=256 (padded)", 36, 128, 256, jnp.int8)
    # 3-window token pack (NP=108)
    if sel is None or 4 in sel:
        bench("bf16  N=108 C=96 P=216*3=648 (pack3)", 108, 96, 648, jnp.bfloat16)
    if sel is None or 5 in sel:
        bench("int8  N=108 C=96 P=648 (pack3)", 108, 96, 648, jnp.int8)
    # headgroup3 shapes: two group passes of (36,48)@(48,108)+(36,108)@(108,48)
    if sel is None or 6 in sel:
        bench("bf16  N=36 C=48 P=108 (hgroup3 x2)", 36, 48, 108, jnp.bfloat16)
    if sel is None or 7 in sel:
        bench("int8  N=36 C=48 P=108 (hgroup3 x2)", 36, 48, 108, jnp.int8)
