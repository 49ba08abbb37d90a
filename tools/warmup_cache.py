"""Pre-compile the production TPU programs into the persistent cache.

Cold-compiling the fused 1080p programs takes minutes (the swin_unet_2x
frame program ~4 min, the iw3 batch-32 pipeline >10 min on this harness);
a user's first frame — or a benchmark rerun — should not pay that.  This
tool compiles each production (metric, shape) config once so later runs
hit jax's persistent compilation cache (JAX_CACHE_DIR, default
/tmp/jax_cache) and start in seconds.  Reference equivalence: the
reference starts converting immediately because torch kernels are
precompiled (nunif/utils/video.py:956); on TPU the persistent cache is
the equivalent mechanism and this tool is its installer.

Usage:
  python tools/warmup_cache.py [config ...]
Configs (default: turbo iw3):
  turbo      turbo_2x 1080p frame program (bench.py + CLI default model)
  waifu2x    swin_unet_2x 1080p frame program (parity arch)
  waifu2x4   same, frame_batch=4
  iw3        Any_V2_S + row_flow_v3 batch-8 pipeline (bench.py default)
  iw3_32     the batch-32 deep-throughput config (long compile!)
  iw3_vda    stlizer + VDA_Stream_S + MLBW batch-8 pipeline

Prints per-config compile wall time; rerun to verify the cache hits
(times drop to seconds).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402


def _warm_waifu2x(frame_batch=1, arch="waifu2x.swin_unet_2x"):
    from nunif_tpu.models import create_model
    from nunif_tpu.utils import TiledRenderer
    import nunif_tpu.waifu2x  # noqa: F401
    model = create_model(arch)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params)
    tile = (1096, 1936) if arch == "waifu2x.turbo_2x" else (1120, 1936)
    prog = renderer.frame_program(1080, 1920, 3, tile_size=tile,
                                  batch_size=1, frame_batch=frame_batch)
    shape = (frame_batch, 1080, 1920, 3) if frame_batch > 1 \
        else (1080, 1920, 3)
    frame = jnp.zeros(shape, jnp.uint8)
    jax.block_until_ready(prog(renderer.params, frame))


def _warm_iw3(batch=8):
    from nunif_tpu.iw3.pipeline import StereoConfig
    from nunif_tpu.iw3.composition import StereoFormat
    from nunif_tpu.iw3.depth import create_depth_model
    from nunif_tpu.iw3.video import Iw3FrameProcessor
    from nunif_tpu.iw3.cli import create_stereo_model
    cfg = StereoConfig(method="row_flow_v3", divergence=2.0,
                       convergence=0.5,
                       format=StereoFormat.from_name("half_sbs"))
    depth_model = create_depth_model("Any_V2_S").load()
    side_model, side_params = create_stereo_model(cfg.method)
    proc = Iw3FrameProcessor(cfg, depth_model, side_model, side_params)
    batch_arr = jnp.zeros((batch, 1080, 1920, 3), jnp.uint8)
    jax.block_until_ready(proc(batch_arr))


def _warm_iw3_vda(batch=8):
    os.environ.setdefault("BENCH_BATCH", str(batch))
    os.environ["BENCH_FRAMES"] = str(batch)  # warmup call only
    import bench
    bench.bench_iw3_vda()


CONFIGS = {
    "waifu2x": lambda: _warm_waifu2x(1),
    "waifu2x4": lambda: _warm_waifu2x(4),
    "iw3": lambda: _warm_iw3(8),
    "iw3_32": lambda: _warm_iw3(32),
    "iw3_vda": lambda: _warm_iw3_vda(8),
    "turbo": lambda: _warm_waifu2x(1, arch="waifu2x.turbo_2x"),
    "turbo4": lambda: _warm_waifu2x(4, arch="waifu2x.turbo_2x"),
}


def main():
    names = sys.argv[1:] or ["turbo", "iw3"]
    for name in names:
        if name not in CONFIGS:
            print(f"unknown config {name!r}; choose from "
                  f"{sorted(CONFIGS)}", file=sys.stderr)
            return 1
        t0 = time.perf_counter()
        CONFIGS[name]()
        dt = time.perf_counter() - t0
        print(f"{name}: compiled+ran in {dt:.1f}s "
              f"({'cache hit' if dt < 60 else 'cold compile'})", flush=True)
    _ = np
    return 0


if __name__ == "__main__":
    sys.exit(main())
