"""Training-data generation entry — one subcommand per addon.

Behavioral parity target: reference create_training_data.py:21-33.

Usage: python create_training_data.py waifu2x --dataset-dir ... --data-dir ...
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def create_default_parser():
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--dataset-dir", "-i", type=str, required=True,
                   help="source image directory")
    p.add_argument("--data-dir", "-o", type=str, required=True,
                   help="output training-data directory")
    return p


def main():
    from nunif_tpu.addon import load_addons
    parser = argparse.ArgumentParser(prog="create_training_data")
    sub = parser.add_subparsers(dest="command", required=True)
    default_parser = create_default_parser()
    for _, register in load_addons("create_training_data"):
        register(sub, default_parser)
    args = parser.parse_args()
    return args.handler(args)


if __name__ == "__main__":
    sys.exit(main())
