"""Microbenchmark swin building blocks in isolation on the TPU.

Small programs compile fast through the remote compile server (unlike the
full frame program), so this is the iteration loop for kernel work.

Timing: fori-loop slope — run the op ITERS times chained through a
lax.fori_loop inside one jit (defeats dispatch overhead + the axon tunnel's
lazy block_until_ready), force a readback, and report (t_total - t_1) /
(ITERS - 1).

Usage:
  python -u tools/microbench_swin.py block   # fused_swin_block per shape
  python -u tools/microbench_swin.py stage   # 2-block stage (orchestration)
  python -u tools/microbench_swin.py attn    # attention-only kernel
Env: MB_SHAPES="full,half,quarter" subset; MB_ITERS=16
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# swin_unet_2x feature-grid shapes for the 1120x1936 bench tile
# (tile - 8 border) = 1112x1928 -> /6 windows... the real grid after the
# patch stem is (1104, 1920); half (552, 960); quarter (276, 480)
SHAPES = {
    # name: (H, W, C, heads)
    "full": (1104, 1920, 96, 6),
    "half": (552, 960, 192, 6),
    "quarter": (276, 480, 192, 6),
}
WS = 6


def _time_loop(fn, x, iters):
    """median-of-3 fori-loop slope timing, seconds per iteration."""
    def once(x):
        return fn(x)

    @jax.jit
    def many(x):
        def body(_, y):
            out = fn(y)
            # keep shape stable for the carry
            return out
        return jax.lax.fori_loop(0, iters, body, x)

    r1 = once(x)
    _ = float(jnp.sum(r1.astype(jnp.float32)))  # compile+run once
    rm = many(x)
    _ = float(jnp.sum(rm.astype(jnp.float32)))  # compile many
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(once(x).astype(jnp.float32)))
        t1 = time.perf_counter()
        _ = float(jnp.sum(many(x).astype(jnp.float32)))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (iters - 1))
    return sorted(ts)[1]


def bench_block(shapes, iters):
    from nunif_tpu.ops.swin_attention import fused_swin_block
    for name in shapes:
        H, W, C, heads = SHAPES[name]
        nh, nw = H // WS, W // WS
        nwin = nh * nw
        N = WS * WS
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((nwin, N, C)) * 0.1,
                        jnp.bfloat16)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
        bqkv = jnp.zeros((3 * C,), jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
        bproj = jnp.zeros((C,), jnp.float32)
        hidden = 2 * C
        wfc1 = jnp.asarray(rng.standard_normal((C, hidden)) * 0.05,
                           jnp.float32)
        bfc1 = jnp.zeros((hidden,), jnp.float32)
        wfc2 = jnp.asarray(rng.standard_normal((hidden, C)) * 0.05,
                           jnp.float32)
        bfc2 = jnp.zeros((C,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, N, N)) * 0.01,
                           jnp.float32)
        for shift in (0, WS // 2):
            fn = lambda y: fused_swin_block(  # noqa: E731
                y, wqkv, bqkv, wproj, bproj, wfc1, bfc1, wfc2, bfc2, bias,
                num_heads=heads, window=WS, shift=shift, n_wh=nh, n_ww=nw)
            dt = _time_loop(fn, x, iters)
            print(f"block {name:8s} shift={shift} nwin={nwin:6d} C={C:3d}: "
                  f"{dt * 1e3:8.3f} ms", flush=True)


def bench_attn(shapes, iters):
    from nunif_tpu.ops.swin_attention import fused_window_attention
    pack = int(os.environ.get("MB_PACK", "0")) or None
    for name in shapes:
        H, W, C, heads = SHAPES[name]
        nh, nw = H // WS, W // WS
        nwin = nh * nw
        N = WS * WS
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((nwin, N, 3 * C)) * 0.1,
                          jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((heads, N, N)) * 0.01,
                           jnp.float32)
        for shift in (0, WS // 2):
            fn = lambda y: fused_window_attention(  # noqa: E731
                y, bias, num_heads=heads, window=WS, shift=shift,
                n_wh=nh, n_ww=nw, pack=pack)
            # qkv->out changes last dim; wrap to keep carry shape: pad back
            def loop_fn(y):
                out = fn(y)
                return jnp.concatenate([out, out, out], axis=-1)
            dt = _time_loop(loop_fn, qkv, iters)
            print(f"attn  {name:8s} shift={shift} pack={pack} "
                  f"nwin={nwin:6d} C={C:3d}: {dt * 1e3:8.3f} ms", flush=True)


def bench_stage(shapes, iters):
    """Two-block stage through the real flax module (incl. partition/roll
    relayouts) — measures orchestration overhead vs 2x bench_block."""
    from nunif_tpu.modules.attention import SwinTransformerBlocks
    for name in shapes:
        H, W, C, heads = SHAPES[name]
        model = SwinTransformerBlocks(C, heads, 2, WS, norm="none")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.1, jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(lambda y: model.apply(params, y))
        dt = _time_loop(fn, x, iters)
        print(f"stage {name:8s} 2 blocks H={H} W={W} C={C}: "
              f"{dt * 1e3:8.3f} ms", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "block"
    shapes = os.environ.get("MB_SHAPES", "full,half,quarter").split(",")
    iters = int(os.environ.get("MB_ITERS", "16"))
    print(f"backend={jax.default_backend()} mode={mode} iters={iters}",
          flush=True)
    if mode == "block":
        bench_block(shapes, iters)
    elif mode == "attn":
        bench_attn(shapes, iters)
    elif mode == "stage":
        bench_stage(shapes, iters)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
