"""Microbench the fused swin block kernel at frame shapes.

Times fused_swin_block per layer via fori-loop slope (chained x->out, so
iterations can't be elided) with device->host readback, per the axon
measurement rules.  Usage: python -u tools/bench_swin_kernel.py [C] [reps]
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

from nunif_tpu.ops.swin_attention import fused_swin_block  # noqa: E402


def bench(C, shift, n_wh, n_ww, variant="headpack", dtype=jnp.bfloat16):
    heads = C // 16
    ws, N = 6, 36
    nw = n_wh * n_ww
    hidden = 2 * C
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (nw, N, C)), dtype)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.float32)
    bproj = jnp.zeros((C,), jnp.float32)
    wfc1 = jnp.asarray(rng.normal(0, 0.05, (C, hidden)), jnp.float32)
    bfc1 = jnp.zeros((hidden,), jnp.float32)
    wfc2 = jnp.asarray(rng.normal(0, 0.05, (hidden, C)), jnp.float32)
    bfc2 = jnp.zeros((C,), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.02, (heads, N, N)), jnp.float32)

    def step(x):
        return fused_swin_block(
            x, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2, bias,
            num_heads=heads, window=ws, shift=shift, n_wh=n_wh, n_ww=n_ww,
            attn_variant=variant)

    @jax.jit
    def loop(x, k):
        def body(_, x):
            return step(x)
        return jax.lax.fori_loop(0, k, body, x)

    # compile + warmup both trip counts
    for k in (2, 10):
        _ = float(jnp.sum(loop(x, k).astype(jnp.float32)))

    def run(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(loop(x, k).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    t2, t10 = run(2), run(10)
    per_layer = (t10 - t2) / 8.0
    print(f"C={C} heads={heads} shift={shift} nw={nw} {variant}: "
          f"{per_layer * 1e3:.2f} ms/layer  (t2={t2*1e3:.1f} t10={t10*1e3:.1f})",
          flush=True)
    return per_layer


if __name__ == "__main__":
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 \
        else ["perhead", "headpack"]
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    for v in variants:
        if C == 96:
            bench(96, 0, 184, 320, v)
            bench(96, 3, 184, 320, v)
        else:
            bench(192, 0, 92, 160, v)
            bench(192, 3, 92, 160, v)
