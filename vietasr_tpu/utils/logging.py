"""Process-aware logging.

Reference: singleton Logger with per-rank console silencing via the RANK
env var and once-only dedup (/root/reference/nemo/utils/nemo_logging.py:36,
88-92). Here rank = jax.process_index() when available, with the same
behaviors: rank-0-only console, optional per-rank file handlers, LogMode.ONCE.
"""

from __future__ import annotations

import enum
import logging
import os
import sys
from typing import Optional, Set


class LogMode(enum.IntEnum):
    EACH = 0
    ONCE = 1


class _OnceFilter(logging.Filter):
    def __init__(self):
        super().__init__()
        self._seen: Set[str] = set()

    def filter(self, record: logging.LogRecord) -> bool:
        if getattr(record, "mode", LogMode.EACH) == LogMode.ONCE:
            key = f"{record.pathname}:{record.lineno}:{record.getMessage()}"
            if key in self._seen:
                return False
            self._seen.add(key)
        return True


_LOGGER: Optional[logging.Logger] = None


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("RANK", 0))


def get_logger(name: str = "vietasr", *, log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        logger.setLevel(level)
        logger.addFilter(_OnceFilter())
        if _process_index() == 0:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(
                "[%(asctime)s %(levelname)s %(name)s] %(message)s",
                datefmt="%H:%M:%S"))
            logger.addHandler(h)
        logger.propagate = False
        _LOGGER = logger
    if log_file is not None:
        path = log_file.replace("%r", str(_process_index()))
        fh = logging.FileHandler(path)
        fh.setFormatter(logging.Formatter(
            "[%(asctime)s %(levelname)s] %(message)s"))
        _LOGGER.addHandler(fh)
    return _LOGGER


def log_once(logger: logging.Logger, msg: str, *args,
             level: int = logging.INFO):
    logger.log(level, msg, *args, extra={"mode": LogMode.ONCE},
               stacklevel=2)
