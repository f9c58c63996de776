"""Console + file logging (replaces the reference's two logger stacks:
tensorpack-style colored logger lib/network/optimizer/logger.py and the
per-epoch stdlib setup_logger lib/utils/logger.py)."""

from __future__ import annotations

import logging
import os
import sys

_FMT = "[%(asctime)s %(levelname).1s %(name)s] %(message)s"
_COLORS = {"WARNING": "\033[33m", "ERROR": "\033[31m", "INFO": "\033[32m"}


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelname)
        if color and sys.stderr.isatty():
            return f"{color}{msg}\033[0m"
        return msg


def setup_logger(name: str = "pose_tpu", log_file: str | None = None,
                 level=logging.INFO) -> logging.Logger:
    """Console (colored when tty) + optional file handler; idempotent."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    sh = logging.StreamHandler()
    sh.setFormatter(_ColorFormatter(_FMT, datefmt="%H:%M:%S"))
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FMT, datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(fh)
    logger.propagate = False
    return logger
