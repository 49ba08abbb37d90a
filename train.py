"""Training entry — one subcommand per addon.

Behavioral parity target: reference train.py:14-26 +
nunif/training/trainer.py:361-445 (shared default parser).

Usage: python train.py waifu2x --data-dir ... --model-dir ... --arch ...
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def create_default_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-samples", type=int, default=10000)
    p.add_argument("--max-epoch", type=int, default=200)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adamw", "sgd", "lion"])
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--scheduler", default="none",
                   choices=["none", "step", "multistep", "cosine"])
    p.add_argument("--backward-steps", type=int, default=1,
                   help="gradient accumulation steps")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="optimizer steps fused into one device program "
                        "(amortizes per-dispatch host latency; metrics and "
                        "hard-example feedback are unchanged)")
    p.add_argument("--ema-decay", type=float, default=None)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=71)
    p.add_argument("--resume", action="store_true")
    return p


def main():
    from nunif_tpu.core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from nunif_tpu.addon import load_addons
    parser = argparse.ArgumentParser(prog="train")
    sub = parser.add_subparsers(dest="command", required=True)
    default_parser = create_default_parser()
    for _, register in load_addons("train"):
        register(sub, default_parser)
    args = parser.parse_args()
    return args.handler(args)


if __name__ == "__main__":
    sys.exit(main())
