"""Thin logging facade (libvis logging.h / loguru analog).

Provides LOG(...) levels and CHECK_* assertions with the semantics badslam
code expects (CHECK failures raise with the failed expression text).
"""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger("badslam_tpu")
if not _logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname).1s [badslam] %(message)s", "%H:%M:%S"))
    _logger.addHandler(_h)
    _logger.setLevel(logging.INFO)


def set_verbosity(level: str) -> None:
    _logger.setLevel(getattr(logging, level.upper()))


def info(msg, *args):
    _logger.info(msg, *args)


def warning(msg, *args):
    _logger.warning(msg, *args)


def error(msg, *args):
    _logger.error(msg, *args)


def fatal(msg, *args):
    _logger.critical(msg, *args)
    raise RuntimeError(msg % args if args else msg)


class CheckError(AssertionError):
    pass


def check(cond, msg="CHECK failed"):
    if not cond:
        raise CheckError(msg)


def check_eq(a, b, msg=""):
    if a != b:
        raise CheckError(f"CHECK_EQ failed: {a!r} != {b!r} {msg}")


def check_le(a, b, msg=""):
    if not a <= b:
        raise CheckError(f"CHECK_LE failed: {a!r} > {b!r} {msg}")


def check_lt(a, b, msg=""):
    if not a < b:
        raise CheckError(f"CHECK_LT failed: {a!r} >= {b!r} {msg}")
