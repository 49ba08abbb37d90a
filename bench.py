"""Benchmark: waifu2x swin_unet_2x 1080p -> 4K frames/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline bar: 30 FPS = "real-time 1080p->4K" north star (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax


def main():
    from nunif_tpu.models import create_model
    from nunif_tpu.utils import TiledRenderer
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.swin_unet_2x")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params)

    rng = np.random.default_rng(0)
    frame = rng.uniform(size=(1080, 1920, 3)).astype(np.float32)

    tile_size = int(os.environ.get("BENCH_TILE", "640"))
    batch_size = int(os.environ.get("BENCH_BATCH", "4"))

    # warmup / compile
    y = renderer.render(frame, tile_size=tile_size, batch_size=batch_size)
    jax.block_until_ready(y)
    assert y.shape == (2160, 3840, 3), y.shape

    n = int(os.environ.get("BENCH_FRAMES", "10"))
    t0 = time.perf_counter()
    for _ in range(n):
        y = renderer.render(frame, tile_size=tile_size, batch_size=batch_size)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    fps = n / dt

    baseline_fps = 30.0  # real-time bar from BASELINE.md north star
    print(json.dumps({
        "metric": "waifu2x_swin_unet_2x_1080p_to_4k_fps",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
