"""find_mapper — offline curve-fitting tool for the mapper parameter tables.

Behavioral parity target: reference iw3/training/find_mapper.py:72-265 —
the tool that DERIVED the softplus parameter tables baked into
iw3/mapper.py (_MUL_PARAMS / _INV_MUL_PARAMS).  It answers three
questions:

  v1v2    which (bias, scale) make softplus01 match the legacy
          softplus01_old(c) curve (reference :72-99)
  mul     which (bias, scale=12) softplus best approximates the
          hardplus(mul_scale) "multiply then clamp" curve (:102-126)
  inv     which inv_softplus01 (bias, scale) best inverts a given
          softplus01 curve, weighted toward the active region (:154-185)

TPU-first redesign: the reference runs 10k-100k torch curve evaluations
in nested Python loops; here the whole (bias x scale) grid evaluates as
ONE vectorized jnp computation against the repo's own mapper functions
(iw3/mapper.py), so the search is exact, instant, and exercises the very
code the parameters are consumed by.

Usage:
  python -m nunif_tpu.iw3.training.find_mapper v1v2 [--c 4 6 8.4]
  python -m nunif_tpu.iw3.training.find_mapper mul [--mul-scale 1.5 2 3]
  python -m nunif_tpu.iw3.training.find_mapper inv
  python -m nunif_tpu.iw3.training.find_mapper check --mapper mul_2 \
      [--csv out.csv]
`check` dumps mapper curves as CSV (the reference shows matplotlib plots;
this environment is headless, so curves export for external plotting).
"""
from __future__ import annotations

import argparse
import math
import sys

import numpy as np
import jax.numpy as jnp

from ..mapper import (
    softplus01_legacy, softplus01, inv_softplus01,
    distance_to_disparity, shift_relative_depth, get_mapper,
)


def hardplus(x, scale: float):
    """Piecewise "multiply then clamp from below" curve the soft mul_*
    mappers approximate (reference iw3/training/find_mapper.py:27-32)."""
    threshold = 1.0 - (1.0 / scale)
    return jnp.where(x >= threshold, (x - threshold) * scale, 0.0)


def _softplus01_grid(x, biases, scales):
    """softplus01 evaluated on a (bias, scale) grid in one shot:
    returns (len(biases), len(scales), len(x))."""
    b = jnp.asarray(biases)[:, None, None]
    s = jnp.asarray(scales)[None, :, None]
    xx = jnp.asarray(x)[None, None, :]
    v = jnp.log1p(jnp.exp((xx - b) * s))
    min_v = jnp.log1p(jnp.exp((0.0 - b) * s))
    max_v = jnp.log1p(jnp.exp((1.0 - b) * s))
    return (v - min_v) / (max_v - min_v)


def fit_softplus_v1_to_v2(c: float, n_bias: int = 100, n_scale: int = 100):
    """(bias, scale) minimizing MAE to the legacy softplus01_old(c) curve
    (reference :72-99; expected ~ c=4 -> bias .333, c=6 -> .5, scale 12)."""
    x = jnp.linspace(0, 1, 1000)
    target = softplus01_legacy(x, c)
    biases = np.linspace(0, 1, n_bias)
    scales = np.linspace(1e-3, 20, n_scale)
    grid = _softplus01_grid(x, biases, scales)
    mae = jnp.mean(jnp.abs(grid - target[None, None, :]), axis=-1)
    i, j = np.unravel_index(int(jnp.argmin(mae)), mae.shape)
    return {"c": c, "bias": float(biases[i]), "scale": float(scales[j]),
            "mae": float(mae[i, j])}


def fit_softplus_to_hardplus(mul_scale: float, margin: float = 0.2,
                             n_bias: int = 1000):
    """bias (scale fixed at 12) minimizing MAE to hardplus(mul_scale) on
    the active region (reference :102-126; expected 1.5 -> .343,
    2 -> .515, 3 -> .687)."""
    threshold = 1.0 - (1.0 / mul_scale)
    threshold += threshold * margin
    x = jnp.linspace(threshold, 1, 1000)
    target = hardplus(x, mul_scale)
    biases = np.linspace(0, 1, n_bias)
    grid = _softplus01_grid(x, biases, [12.0])[:, 0, :]
    mae = jnp.mean(jnp.abs(grid - target[None, :]), axis=-1)
    i = int(jnp.argmin(mae))
    return {"mul_scale": mul_scale, "bias": float(biases[i]), "scale": 12.0,
            "mae": float(mae[i])}


def fit_inv_softplus(softplus_bias: float, softplus_scale: float,
                     mul_scale: float, margin: float = 0.2,
                     n_bias: int = 1000, n_scale: int = 100):
    """(bias, scale) for inv_softplus01 so inv(f(x)) ~ x, error weighted
    toward the post-threshold region (reference :154-185)."""
    threshold = 1.0 - (1.0 / mul_scale)
    threshold += threshold * margin
    error_scale2 = (1.0 - threshold) / threshold
    x = jnp.linspace(0, 1, 1000)
    y = softplus01(x, softplus_bias, softplus_scale)
    lo = x <= threshold
    biases = np.linspace(-0.1, 0.1, n_bias)
    scales = np.linspace(-20, 20, n_scale)
    b = jnp.asarray(biases)[:, None, None]
    s = jnp.asarray(scales)[None, :, None]
    yy = y[None, None, :]
    v = jnp.log(jnp.clip(jnp.expm1((yy - b) * s), min=1e-6))
    min_v = jnp.log(jnp.clip(jnp.expm1((0.0 - b) * s), min=1e-6))
    max_v = jnp.log(jnp.clip(jnp.expm1((1.0 - b) * s), min=1e-6))
    x2 = (v - min_v) / (max_v - min_v)
    err = (x[None, None, :] - x2) ** 2
    e1 = jnp.mean(err, axis=-1, where=lo[None, None, :])
    e2 = jnp.mean(err, axis=-1, where=(~lo)[None, None, :])
    score = e1 + e2 * error_scale2
    i, j = np.unravel_index(int(jnp.argmin(score)), score.shape)
    return {"softplus_bias": softplus_bias, "bias": float(biases[i]),
            "scale": float(scales[j]), "mse": float(score[i, j])}


def dump_curves(names, path=None, n: int = 1000):
    """CSV of mapper curves (x, then one column per mapper) — the headless
    replacement for the reference's matplotlib check_* plots."""
    x = np.linspace(0, 1, n, dtype=np.float32)
    cols = [x]
    for name in names:
        cols.append(np.asarray(get_mapper(name)(jnp.asarray(x)), np.float32))
    out = np.stack(cols, axis=1)
    header = ",".join(["x"] + list(names))
    if path:
        np.savetxt(path, out, delimiter=",", header=header, comments="")
        return path
    print(header)
    for row in out[:: max(n // 20, 1)]:
        print(",".join(f"{v:.5f}" for v in row))
    return None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("v1v2", help="legacy softplus c -> (bias, scale)")
    p1.add_argument("--c", type=float, nargs="+", default=[4.0, 6.0, 8.4])
    p2 = sub.add_parser("mul", help="hardplus mul -> softplus bias")
    p2.add_argument("--mul-scale", type=float, nargs="+",
                    default=[1.5, 2.0, 3.0])
    sub.add_parser("inv", help="fit inv_softplus params for mul_1/2/3")
    p4 = sub.add_parser("check", help="dump mapper curves as CSV")
    p4.add_argument("--mapper", nargs="+",
                    default=["none", "mul_1", "mul_2", "mul_3",
                             "inv_mul_1", "inv_mul_2", "inv_mul_3"])
    p4.add_argument("--csv", default=None)
    args = p.parse_args(argv)

    if args.cmd == "v1v2":
        for c in args.c:
            r = fit_softplus_v1_to_v2(c)
            print(f"c={c}: bias={r['bias']:.3f} scale={r['scale']:.3f} "
                  f"MAE={r['mae']:.5f}")
    elif args.cmd == "mul":
        for m in args.mul_scale:
            r = fit_softplus_to_hardplus(m)
            print(f"mul_scale={m}: bias={r['bias']:.3f} scale=12 "
                  f"MAE={r['mae']:.5f}")
    elif args.cmd == "inv":
        for bias, mul in ((0.343, 1.5), (0.515, 2.0), (0.687, 3.0)):
            r = fit_inv_softplus(bias, 12.0, mul)
            print(f"softplus_bias={bias}: inv bias={r['bias']:.6f} "
                  f"scale={r['scale']:.4f} MSE={r['mse']:.5f}")
    elif args.cmd == "check":
        out = dump_curves(args.mapper, args.csv)
        if out:
            print(f"wrote {out}")
    _ = (math, distance_to_disparity, shift_relative_depth)
    return 0


if __name__ == "__main__":
    sys.exit(main())
