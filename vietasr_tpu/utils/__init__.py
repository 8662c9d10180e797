from vietasr_tpu.utils.logging import get_logger, LogMode
from vietasr_tpu.utils.exp_manager import ExpManager
from vietasr_tpu.utils.env import (
    get_envbool,
    get_envint,
    get_envfloat,
    get_envlist,
    get_env,
)
from vietasr_tpu.utils.decorators import deprecated

__all__ = [
    "get_logger",
    "LogMode",
    "ExpManager",
    "get_envbool",
    "get_envint",
    "get_envfloat",
    "get_envlist",
    "get_env",
    "deprecated",
]
