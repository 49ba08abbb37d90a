"""Per-op device profile of the iw3 fast-path programs (infer + compose).

Prints the top-30 device ops by total time for (a) the depth+stats program
and (b) the normalize+warp+compose program, at bench shapes.
Usage: python -u tools/profile_iw3.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def dev_op_times(outdir):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n or "Chip" in n}
    if not dev_pids:
        dev_pids = {3}
    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            per_op[e.get("name", "?")] += e.get("dur", 0.0)
    return per_op


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iw3_prof"
    os.makedirs(outdir, exist_ok=True)
    from nunif_tpu.iw3.pipeline import StereoConfig
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
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    batch = jnp.asarray(
        (rng.uniform(size=(bsz, 1080, 1920, 3)) * 255).astype(np.uint8))

    # warm both programs via the fast path (EMA off -> but bench default has
    # buffer_size=1, decay=0 -> fully-fused single program path)
    out = proc(batch)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print("warmup done", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(2):
        out = proc(batch)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    print("trace done", flush=True)

    per_op = dev_op_times(outdir)
    total = sum(per_op.values())
    print(f"total device time: {total/1e3:.1f} ms (2 batches of {bsz})",
          flush=True)
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1e3:9.3f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
