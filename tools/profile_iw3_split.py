"""Per-op device profile of the iw3 depth program and compose program
SEPARATELY (the full-path profile fuses everything into one jit_full_fn,
hiding the split).  Usage: python -u tools/profile_iw3_split.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from profile_iw3 import dev_op_times  # noqa: E402


def report(outdir, label, bsz):
    per_op = dev_op_times(outdir)
    total = sum(per_op.values())
    print(f"== {label}: total {total/1e3:.1f} ms (2 calls, batch {bsz}) "
          f"-> {total/1e3/2/bsz:.2f} ms/frame", flush=True)
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:22]:
        print(f"{us/1e3:9.3f} ms  {name}", flush=True)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iw3_prof_split"
    from nunif_tpu.iw3.pipeline import StereoConfig, preprocess_image
    from nunif_tpu.iw3.composition import StereoFormat
    from nunif_tpu.iw3.depth import create_depth_model
    from nunif_tpu.iw3.video import Iw3FrameProcessor
    from nunif_tpu.iw3.cli import create_stereo_model

    cfg = StereoConfig(method="row_flow_v3", divergence=2.0, convergence=0.5,
                       format=StereoFormat.from_name("half_sbs"))
    depth_model = create_depth_model(
        os.environ.get("BENCH_IW3_DEPTH", "Any_V2_S")).load()
    side_model, side_params = create_stereo_model(cfg.method)
    proc = Iw3FrameProcessor(cfg, depth_model, side_model, side_params)

    rng = np.random.default_rng(0)
    bsz = int(os.environ.get("BENCH_BATCH", "16"))
    batch = jnp.asarray(
        (rng.uniform(size=(bsz, 1080, 1920, 3)) * 255).astype(np.uint8))

    prep = jax.jit(lambda u8: preprocess_image(
        u8.astype(jnp.float32) * (1.0 / 255.0), cfg))
    x = prep(batch)
    d = depth_model.infer(x)
    mn = jnp.min(d, axis=(1, 2, 3), keepdims=True)
    mx = jnp.max(d, axis=(1, 2, 3), keepdims=True)
    dn = jax.jit(depth_model.scaler.normalize)(d, mn, mx)
    comp = jax.jit(proc._compose_impl)
    out = comp(dn, x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print("warmup done", flush=True)

    dd = os.path.join(outdir, "depth")
    jax.profiler.start_trace(dd)
    for _ in range(2):
        d = depth_model.infer(x)
    _ = float(jnp.sum(d))
    jax.profiler.stop_trace()
    report(dd, "depth infer (incl. in-program preprocess resize)", bsz)

    cd = os.path.join(outdir, "compose")
    jax.profiler.start_trace(cd)
    for _ in range(2):
        out = comp(dn, x)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    report(cd, "normalize+warp+compose", bsz)


if __name__ == "__main__":
    main()
