"""Microbench: XLA batched dots at window-attention shapes vs the Pallas
kernel's measured per-window floor.

The fused kernel's per-window cost (~0.52us at C=96) matches a
single-MXU weight-load/issue model.  If XLA's batched dot_general runs the
same (BW, N, C) @ (BW, C, P) contraction materially faster per window, the
TensorCore is parallelizing the batch across MXUs and a hybrid block
(XLA dots + Pallas layout) would beat the all-in-kernel design.

Usage: python -u tools/microbench_attn_dots.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def bench(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    BW = 58880           # full-res windows per layer (1104x1920, ws=6)
    N, C, H = 36, 96, 6
    P = H * N
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 0.5, (BW, N, C)), jnp.bfloat16)
    khat = jnp.asarray(rng.normal(0, 0.5, (BW, C, P)), jnp.bfloat16)
    e = jnp.asarray(rng.uniform(0, 1, (BW, N, P)), jnp.bfloat16)
    vhat = jnp.asarray(rng.normal(0, 0.5, (BW, P, C + H)), jnp.bfloat16)

    @jax.jit
    def scores_dot(q, khat):
        return jax.lax.dot_general(
            q, khat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def out_dot(e, vhat):
        return jax.lax.dot_general(
            e, vhat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t1 = bench(scores_dot, q, khat)
    t2 = bench(out_dot, e, vhat)
    print(f"XLA scores dot (BW,{N},{C})@(BW,{C},{P}):  {t1*1e3:8.3f} ms "
          f"= {t1/BW*1e9:6.1f} ns/window")
    print(f"XLA out dot    (BW,{N},{P})@(BW,{P},{C+H}): {t2*1e3:8.3f} ms "
          f"= {t2/BW*1e9:6.1f} ns/window")
    print(f"sum per window: {(t1+t2)/BW*1e9:.1f} ns "
          f"(kernel floor ~520 ns incl. shared matmuls; attention-dot "
          f"portion of kernel ~300 ns)")

    # reference: a dense token matmul at the same total token count, to see
    # what fraction of peak the batched dots reach
    x = jnp.asarray(rng.normal(0, 0.5, (BW * N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.bfloat16)

    @jax.jit
    def dense(x, w):
        return jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t3 = bench(dense, x, w)
    flops = 2 * BW * N * C * 3 * C
    print(f"dense qkv matmul ({BW*N},{C})@({C},{3*C}): {t3*1e3:8.3f} ms "
          f"= {flops/t3/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
