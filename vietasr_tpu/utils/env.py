"""Typed environment-variable getters.

Reference: nemo/utils/env_var_parsing.py:143-208 (get_envbool/int/float/
list/dict with coercion + RequiredSettingMissing).
"""

from __future__ import annotations

import json
import os
from typing import Any, List


class RequiredSettingMissing(Exception):
    def __init__(self, key: str):
        super().__init__(f"required env var {key!r} is missing")


_MISSING = object()


def get_env(key: str, *default: Any, coerce=lambda x: x) -> Any:
    if key not in os.environ:
        if default:
            return default[0]
        raise RequiredSettingMissing(key)
    return coerce(os.environ[key])


def _bool(value: str) -> bool:
    return value.strip().lower() in ("true", "1", "y", "yes", "on")


def get_envbool(key: str, *default) -> bool:
    return get_env(key, *default, coerce=_bool)


def get_envint(key: str, *default) -> int:
    return get_env(key, *default, coerce=int)


def get_envfloat(key: str, *default) -> float:
    return get_env(key, *default, coerce=float)


def get_envlist(key: str, *default, separator: str = " ") -> List[str]:
    return get_env(key, *default, coerce=lambda x: x.split(separator))


def get_envdict(key: str, *default) -> dict:
    return get_env(key, *default, coerce=json.loads)


def enable_compilation_cache(cache_dir: str = "") -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    On a remote-attached TPU every cold compile pays the full
    compile-service round trip (minutes for big train steps on a
    contended link); the persistent cache makes every later process —
    CLI runs, tools, bench, tests — reuse serialized executables.
    Honors JAX_COMPILATION_CACHE_DIR if the user already set one;
    defaults to <repo>/.jax_cache next to this package. Returns the
    directory used. Verified to work with the axon PJRT backend."""
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(
                     os.path.dirname(os.path.abspath(__file__)))),
                     ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
