"""Average/merge model checkpoints (reference nunif/cli/merge_model.py +
nunif/models/utils.py:135-159 merge_state_dict / mean_state_dict).

Usage: python -m nunif_tpu.cli.merge_model -i a.nztm b.nztm -o merged.nztm
       [--weights 0.7 0.3]
"""
from __future__ import annotations

import argparse
import sys

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="merge_model", description=__doc__)
    p.add_argument("--input", "-i", nargs="+", required=True)
    p.add_argument("--output", "-o", required=True)
    p.add_argument("--weights", type=float, nargs="+", default=None)
    args = p.parse_args(argv)

    from ..models.io import load_model, save_model

    weights = args.weights or [1.0 / len(args.input)] * len(args.input)
    assert len(weights) == len(args.input)

    model = None
    acc = None
    for path, w in zip(args.input, weights):
        m, params, meta = load_model(path)
        if model is None:
            model = m
            acc = jax.tree.map(lambda a: np.asarray(a, np.float64) * w, params)
        else:
            assert m.model_name == model.model_name, "architecture mismatch"
            acc = jax.tree.map(lambda a, b: a + np.asarray(b, np.float64) * w,
                               acc, params)
    merged = jax.tree.map(lambda a: a.astype(np.float32), acc)
    save_model(model, merged, args.output)
    print(f"merged {len(args.input)} checkpoints -> {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
