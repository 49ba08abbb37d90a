"""Profile the waifu2x frame program on the TPU and aggregate device ops.

Usage: python -u tools/profile_waifu2x.py [outdir]
Parses the trace's device lane and prints the top op groups by total time.
"""
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waifu2x_prof"
    from nunif_tpu.models import create_model
    from nunif_tpu.utils import TiledRenderer
    import nunif_tpu.waifu2x  # noqa: F401

    arch = os.environ.get("BENCH_ARCH", "waifu2x.swin_unet_2x")
    model = create_model(arch)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params)
    tile = ((1096, 1936) if arch == "waifu2x.turbo_2x" else (1120, 1936))
    prog = renderer.frame_program(1080, 1920, 3, tile_size=tile,
                                  batch_size=1)
    cksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.uint32)))
    rng = np.random.default_rng(0)
    frame = jnp.asarray((rng.uniform(size=(1080, 1920, 3)) * 255)
                        .astype(np.uint8))
    _ = int(cksum(prog(renderer.params, frame)))
    print("warmup done", flush=True)

    jax.profiler.start_trace(outdir)
    s = cksum(prog(renderer.params, frame))
    _ = int(s)
    jax.profiler.stop_trace()
    print("trace done", flush=True)

    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find device lane pids
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Chip" in n}
    if not dev_pids:
        dev_pids = {3}
    groups = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # ms
        total += dur
        g = re.sub(r"[.\d]+$", "", name)
        groups[g] += dur
    print(f"total device time: {total:.1f} ms")
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.2f} ms  {g}")
    # ungrouped top ops (exact fusion instances) — the grouped view hides
    # which reshape/fusion sites dominate
    singles = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or "fused_swin" in name:
            continue
        singles[name] += e.get("dur", 0) / 1000.0
    print("--- top single ops ---")
    for g, ms in sorted(singles.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} ms  {g}")


if __name__ == "__main__":
    main()
