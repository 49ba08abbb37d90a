"""Microbench: in-kernel image-strip <-> window relayout cost.

The stage-kernel design reads (rh*6, cw*6, C) image blocks straight from
the frame layout and forms (rh*cw, 36, C) windows in VMEM.  This measures
that relayout against (a) a plain VMEM passthrough and (b) the current
XLA-side partition transpose, at full-res 1080p shapes.

Usage: python -u tools/microbench_strip.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H, W, C, ws = 1104, 1920, 96, 6
nh, nw = H // ws, W // ws


def _pass_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.asarray(1.0009765625, x_ref.dtype)


def _relayout_kernel(x_ref, o_ref, *, rh, cw):
    x = x_ref[0]                                # (rh*ws, cw*ws, C)
    xw = x.reshape(rh, ws, cw, ws, C).transpose(0, 2, 1, 3, 4)
    xw = xw.reshape(rh * cw, ws * ws, C)        # windows
    xw = xw * jnp.asarray(1.0009765625, x.dtype)
    y = xw.reshape(rh, cw, ws, ws, C).transpose(0, 2, 1, 3, 4)
    o_ref[0] = y.reshape(rh * ws, cw * ws, C)


def bench(fn, x, n=30):
    r = fn(x)
    _ = float(jnp.sum(r.astype(jnp.float32)[:8, :8]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(x)
    _ = float(jnp.sum(r.astype(jnp.float32)[:8, :8]))
    return (time.perf_counter() - t0) / n * 1e3


def strip_call(kernel, _rh, _cw, **kw):
    rh, cw = _rh, _cw
    grid = (nh // rh, nw // cw)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(kernel, **kw) if kw else kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, rh * ws, cw * ws, C),
                                   lambda i, j: (0, i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rh * ws, cw * ws, C),
                                   lambda i, j: (0, i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, W, C), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
    return run


@jax.jit
def xla_partition_roundtrip(x):
    xw = x.reshape(1, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(nh * nw, ws * ws, C)
    xw = xw * jnp.asarray(1.0009765625, x.dtype)
    y = xw.reshape(1, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(1, H, W, C)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, C)), jnp.bfloat16)

    t = bench(xla_partition_roundtrip, x)
    print(f"XLA partition+reverse roundtrip: {t:.3f} ms", flush=True)

    for rh, cw in ((8, 8), (16, 8), (8, 16), (4, 32), (16, 4), (46, 8),
                   (8, 32)):
        if nh % rh or nw % cw:
            continue
        try:
            tp = bench(strip_call(_pass_kernel, rh, cw), x)
            tr = bench(strip_call(_relayout_kernel, rh, cw, rh=rh, cw=cw), x)
            print(f"strip rh={rh:2d} cw={cw:2d}: pass={tp:.3f} ms  "
                  f"relayout-roundtrip={tr:.3f} ms  (delta {tr - tp:+.3f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"strip rh={rh:2d} cw={cw:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
