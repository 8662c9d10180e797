"""Decorators (reference nemo/utils/decorators/deprecated.py:31)."""

from __future__ import annotations

import functools

from vietasr_tpu.utils.logging import get_logger, log_once


def deprecated(version: str = "", explanation: str = ""):
    """Warn (once) when the wrapped callable is used."""

    def wrapper(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            msg = f"{fn.__name__} is deprecated"
            if version:
                msg += f" and will be removed in {version}"
            if explanation:
                msg += f". {explanation}"
            log_once(get_logger(), msg)
            return fn(*args, **kwargs)

        return inner

    return wrapper
