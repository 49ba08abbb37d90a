"""Microbench the stlizer stage pieces (SuperPoint detect vs stabilization
warp) at the iw3_vda bench shapes — the assembled-pipeline stage measured
184.6 ms/frame (r4), far above the sum of its parts' expected costs."""
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

from nunif_tpu.utils.superpoint import SuperPoint, apply_transform
from nunif_tpu.modules.resize import resize


def timeit(fn, *args, label="", reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label}: {dt*1000:.1f} ms/call", flush=True)


def timeit_loop(step, x, label=""):
    """fori-loop slope: device time only, no per-call dispatch latency
    (this harness's tunnel adds 10s-100s ms of dispatch jitter).  ``step``
    MUST consume its carry or XLA hoists it out of the loop."""
    @jax.jit
    def loop(x0, k):
        def body(_, c):
            return step(c)
        return jax.lax.fori_loop(0, k, body, x0)

    for k in (2, 10):
        _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[:1, :2]))

    def run(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[:1, :2]))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(10) - run(2)) / 8.0
    print(f"  {label}: {per*1000:.1f} ms/iter (device slope)", flush=True)


def main():
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        (rng.uniform(size=(bsz, 1080, 1920, 3)) * 255).astype(np.uint8))
    shift = jnp.asarray(rng.normal(0, 3, (bsz, 2)), jnp.float32)
    angle = jnp.asarray(rng.normal(0, 0.2, (bsz,)), jnp.float32)

    sp = SuperPoint(max_num_keypoints=512)
    sp_params = sp.init_params(jax.random.PRNGKey(0), (1, 64, 64, 1))
    rh, rw = 320, 568

    to_f32 = jax.jit(lambda u8: u8.astype(jnp.float32) / 255.0)
    small = jax.jit(lambda x: resize(x, rh, rw, mode="bilinear",
                                     antialias=True))
    spfn = jax.jit(lambda p, xs: sp.apply_fn(p, xs))

    def warp(x, shift, angle):
        B = x.shape[0]
        center = jnp.broadcast_to(
            jnp.asarray([[960.0, 540.0]], jnp.float32), (B, 2))
        return apply_transform(x, shift, jnp.ones((B,), jnp.float32),
                               angle, center)

    warpfn = jax.jit(warp)

    x = to_f32(batch)
    jax.block_until_ready(x)
    xs = small(x)
    jax.block_until_ready(xs)

    timeit(to_f32, batch, label=f"u8->f32 (batch {bsz})")
    timeit(small, x, label="resize to 320x568")
    timeit(spfn, sp_params, xs, label="SuperPoint detect")
    timeit(warpfn, x, shift, angle, label="apply_transform 1080p")

    # device-only slopes (step consumes the carry -> no LICM hoisting)
    timeit_loop(lambda c: c * 0.999
                + sp.apply_fn(sp_params, c)["scores"].sum() * 1e-9,
                xs, label="SuperPoint detect")
    timeit_loop(lambda c: warp(c, shift, angle), x,
                label="apply_transform 1080p")


if __name__ == "__main__":
    main()
