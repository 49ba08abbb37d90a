"""Framework logger (reference: nunif/logger.py:5-28).

One stdlib logger named "nunif_tpu"; DEBUG env var switches to debug level.
"""
import logging
import os
import sys

logger = logging.getLogger("nunif_tpu")
if not logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s [%(levelname)s] %(message)s"))
    logger.addHandler(_handler)
    logger.propagate = False
if os.environ.get("DEBUG"):
    logger.setLevel(logging.DEBUG)
else:
    logger.setLevel(logging.INFO)


def set_log_level(level):
    logger.setLevel(level)
