"""List accelerator devices (reference nunif/cli/list_device.py)."""
import sys


def main(argv=None):
    import jax
    for i, d in enumerate(jax.devices()):
        print(f"{i}: {d.device_kind} ({d.platform})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
