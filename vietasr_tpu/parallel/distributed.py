"""Multi-host coordination utilities.

TPU-native replacements for the reference's torch.distributed/NCCL plumbing
(/root/reference/nemo/core/neural_factory.py:342-391, 708-734):

  init_process_group("nccl")        -> jax.distributed.initialize()
  all-reduce-MIN health check       -> sync_all_processes (psum of a flag)
  uint8-tensor string broadcast     -> broadcast_string (broadcast_one_to_all)
  padded all_gather for eval        -> gather_eval_results (process_allgather)

All of these are no-ops / local passthroughs in single-process runs, so the
same training script runs 1-chip and N-host unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize JAX distributed when running multi-host; returns the
    process topology. Safe to call in single-process runs (no-op)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def sync_all_processes(status: bool = True) -> None:
    """Cooperative failure barrier: every process contributes a flag; if any
    is False, all raise (reference sync_all_processes MIN-allreduce,
    neural_factory.py:708-734)."""
    if jax.process_count() == 1:
        if not status:
            raise RuntimeError("process signalled failure")
        return
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if status else 0], np.int32))
    multihost_utils.sync_global_devices("vietasr_sync_all")
    if int(np.min(flags)) == 0:
        raise RuntimeError("at least one process signalled failure")


def broadcast_string(s: str, max_len: int = 256) -> str:
    """Rank-0 string broadcast (workdir timestamps etc.; reference encodes
    into a uint8 tensor, neural_factory.py:375-391)."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = s.encode("utf-8")[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(out[out != 0]).decode("utf-8")


def gather_eval_results(local: np.ndarray) -> np.ndarray:
    """Gather fixed-shape per-host eval arrays to every host (reference pads
    then all_gathers variable shapes, actions.py:584-616; our batches are
    already statically padded so no shape gather is needed)."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(local)
