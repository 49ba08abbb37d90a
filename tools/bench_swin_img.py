"""Microbench: image-layout fused swin block vs partition+window kernel.

Times the FULL block edge (for the window kernel: pad + partition +
fused_swin_block + reverse + crop; for the image kernel: pad +
fused_swin_block_image + crop) at 1080p-tile shapes, fori-loop slope.
Usage: python -u tools/bench_swin_img.py [C] [rh,cw ...]
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

from nunif_tpu.ops.swin_attention import (  # noqa: E402
    fused_swin_block, fused_swin_block_image)


def make(C, H, W):
    heads = C // 16
    ws = 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (1, H, W, C)), jnp.bfloat16)
    hidden = 2 * C

    def mk(*s):
        return jnp.asarray(rng.normal(0, 0.05, s), jnp.float32)
    w = [mk(C, 3 * C), jnp.zeros(3 * C), mk(C, C), jnp.zeros(C),
         mk(C, hidden), jnp.zeros(hidden), mk(hidden, C), jnp.zeros(C)]
    bias = mk(heads, ws * ws, ws * ws)
    return x, w, bias, heads, ws


def bench_loop(step, x, label):
    @jax.jit
    def loop(x, k):
        def body(_, x):
            return step(x)
        return jax.lax.fori_loop(0, k, body, x)

    for k in (2, 10):
        _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[0, :8, :8]))

    def run(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(jnp.sum(loop(x, k).astype(jnp.float32)[0, :8, :8]))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(10) - run(2)) / 8.0
    print(f"  {label}: {per * 1e3:.2f} ms/block-edge", flush=True)
    return per


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    # combo: rh,cw[,variant] — e.g. 8,4,rowpack4 (cw is ignored by rowpack)
    combos = []
    for a in sys.argv[2:]:
        parts = a.split(",")
        combos.append((int(parts[0]), int(parts[1]),
                       parts[2] if len(parts) > 2 else None))
    combos = combos or [(1, 16, None), (2, 16, None), (1, 32, None),
                        (2, 32, None), (4, 16, None)]
    H, W = (1104, 1920) if C == 96 else (552, 960)
    x, w, bias, heads, ws = make(C, H, W)
    nh, nw = H // ws, W // ws

    for shift in (0, 3):
        print(f"C={C} H={H} W={W} shift={shift}", flush=True)

        def win_step(xin, shift=shift):
            if shift > 0:
                xp = jnp.pad(xin, ((0, 0), (shift, ws - shift),
                                   (shift, ws - shift), (0, 0)))
                nh2, nw2 = nh + 1, nw + 1
            else:
                xp, nh2, nw2 = xin, nh, nw
            xw = xp.reshape(1, nh2, ws, nw2, ws, C) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(nh2 * nw2, ws * ws, C)
            y = fused_swin_block(xw, *w, bias, num_heads=heads, window=ws,
                                 shift=shift, n_wh=nh2, n_ww=nw2,
                                 shift_mode="pad")
            y = y.reshape(1, nh2, nw2, ws, ws, C) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(1, nh2 * ws, nw2 * ws, C)
            if shift > 0:
                y = y[:, shift:shift + H, shift:shift + W]
            return y

        bench_loop(win_step, x, "window-kernel edge (current)")

        for rh, cw, variant in combos:
            def img_step(xin, shift=shift, rh=rh, cw=cw, variant=variant):
                if shift > 0:
                    xp = jnp.pad(xin, ((0, 0), (shift, ws - shift),
                                       (shift, ws - shift), (0, 0)))
                else:
                    xp = xin
                y = fused_swin_block_image(
                    xp, *w, bias, num_heads=heads, window=ws, shift=shift,
                    block_rows=rh, block_cols=cw, attn_variant=variant,
                    shift_mode="pad")
                if shift > 0:
                    y = y[:, shift:shift + H, shift:shift + W]
                return y
            label = f"image-kernel rh={rh} cw={cw} v={variant or 'default'}"
            try:
                bench_loop(img_step, x, label)
            except Exception as e:  # noqa: BLE001
                print(f"  {label}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
