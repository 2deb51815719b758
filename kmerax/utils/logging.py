"""Structured logging with per-host prefixes (SURVEY.md §5 observability)."""

from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s %(levelname).1s [host%(host)s] %(name)s: %(message)s"


class _HostFilter(logging.Filter):
    def __init__(self):
        super().__init__()
        self.host = os.environ.get("KMERAX_PROCESS_INDEX", "0")

    def filter(self, record):
        record.host = self.host
        return True


def get_logger(name: str = "kmerax") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        h.addFilter(_HostFilter())
        logger.addHandler(h)
        logger.setLevel(os.environ.get("KMERAX_LOG", "INFO"))
        logger.propagate = False
    return logger
