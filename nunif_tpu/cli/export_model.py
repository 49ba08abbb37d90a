"""Export a checkpoint as a portable StableHLO artifact (.nzhlo).

TPU-native replacement of the reference ONNX export CLI
(reference: waifu2x/export_onnx.py).

  python -m nunif_tpu.cli.export_model -i model.nztm -o model.nzhlo \
      --tile-size 256 --batch-size 4
"""
import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="export_model", description=__doc__)
    p.add_argument("--input", "-i", required=True, help=".nztm checkpoint")
    p.add_argument("--output", "-o", required=True, help=".nzhlo artifact")
    p.add_argument("--tile-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--bake-params", action="store_true")
    args = p.parse_args(argv)

    from ..models.io import load_model
    from ..models.export import export_model
    import nunif_tpu.waifu2x.models  # noqa: F401
    import nunif_tpu.iw3.models  # noqa: F401

    model, params, _ = load_model(args.input)
    in_ch = getattr(model, "i2i_in_channels", 3)
    shape = (args.batch_size, args.tile_size, args.tile_size, in_ch)
    export_model(model, params, args.output, shape,
                 bake_params=args.bake_params)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
