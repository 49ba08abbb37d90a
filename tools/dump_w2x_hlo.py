"""Dump the compiled HLO + top individual device ops of the waifu2x frame
program.  Writes <out>/hlo.txt and prints the top-40 ops by device time.

Usage: python -u tools/dump_w2x_hlo.py [outdir]
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


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/w2x_hlo"
    os.makedirs(outdir, exist_ok=True)
    from nunif_tpu.models import create_model
    from nunif_tpu.utils import TiledRenderer
    import nunif_tpu.waifu2x  # noqa: F401

    model = create_model("waifu2x.swin_unet_2x")
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
    renderer = TiledRenderer(model, params)
    prog = renderer.frame_program(1080, 1920, 3, tile_size=(1120, 1936),
                                  batch_size=1)
    rng = np.random.default_rng(0)
    frame = jnp.asarray((rng.uniform(size=(1080, 1920, 3)) * 255)
                        .astype(np.uint8))
    # compile + warmup
    y = prog(renderer.params, frame)
    _ = int(jnp.sum(y.astype(jnp.uint32)))
    print("warmup done", flush=True)

    # optimized HLO text (post-layout-assignment)
    try:
        lowered = jax.jit(prog._fun if hasattr(prog, "_fun") else prog)
    except Exception:
        lowered = None
    try:
        traced = jax.jit(lambda p, f: prog(p, f)).lower(renderer.params,
                                                        frame)
        compiled = traced.compile()
        with open(os.path.join(outdir, "hlo.txt"), "w") as f:
            f.write(compiled.as_text())
        print("hlo written", len(compiled.as_text()), flush=True)
    except Exception as e:
        print("hlo dump failed:", e, flush=True)

    jax.profiler.start_trace(outdir)
    s = jnp.sum(prog(renderer.params, frame).astype(jnp.uint32))
    _ = int(s)
    jax.profiler.stop_trace()
    print("trace done", flush=True)

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
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:40]
    for name, us in top:
        print(f"{us / 1e3:9.3f} ms  {name}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
