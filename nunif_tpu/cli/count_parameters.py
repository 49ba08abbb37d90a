"""Count model parameters (reference nunif/cli/count_parameters.py).

Usage: python -m nunif_tpu.cli.count_parameters -m model.nztm
       python -m nunif_tpu.cli.count_parameters --arch waifu2x.swin_unet_2x
"""
from __future__ import annotations

import argparse
import sys

import jax


def main(argv=None):
    p = argparse.ArgumentParser(prog="count_parameters", description=__doc__)
    p.add_argument("--model-file", "-m", default=None)
    p.add_argument("--arch", default=None)
    args = p.parse_args(argv)

    if args.model_file:
        from ..models.io import load_model
        model, params, _ = load_model(args.model_file)
        name = model.model_name
    elif args.arch:
        from ..models import create_model
        from ..models.io import _ensure_registered
        _ensure_registered(args.arch)
        model = create_model(args.arch)
        params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64, 3))
        name = args.arch
    else:
        p.error("one of --model-file / --arch is required")

    total = sum(x.size for x in jax.tree.leaves(params))
    print(f"{name}: {total:,} parameters")
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        print(f"  {key}: {tuple(leaf.shape)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
