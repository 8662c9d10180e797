"""Checkpoint manager: step-stamped saves, keep-last-K, latest-restore.

Reference capabilities (nemo/core/callbacks.py:241-380 CheckpointCallback +
nemo/utils/helpers.py:31-66 newest-step matching): periodic save, keep-K
pruning, restore newest on startup. Serialization is flax msgpack over the
whole TrainState pytree (one file per step instead of one file per module +
a trainer file).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import flax.serialization
import jax

_CKPT_RE = re.compile(r"state-STEP-(\d+)\.msgpack$")


class CheckpointManager:
    def __init__(self, folder: str, *, keep: int = 4):
        self.folder = folder
        self.keep = keep
        os.makedirs(folder, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.folder, f"state-STEP-{step}.msgpack")

    def list_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.folder):
            m = _CKPT_RE.search(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def save(self, state, step: Optional[int] = None) -> str:
        step = int(state.step) if step is None else int(step)
        # ONE batched device->host transfer before serializing. flax's
        # to_bytes walks the tree calling np.asarray per leaf — hundreds
        # of sequential d2h round trips, each paying full link latency on
        # a remote-attached chip (measured: minutes per save mid-training,
        # faulthandler pinned at serialization.py _np_convert_in_place ->
        # array._value). device_get issues every copy up front and
        # overlaps them; the serializer then sees host arrays.
        state = jax.device_get(state)
        data = flax.serialization.to_bytes(state)
        path = self._path(step)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)           # atomic: no torn checkpoints
        self._prune()
        return path

    def restore(self, template, step: Optional[int] = None):
        """Restore into the structure of `template` (a TrainState with the
        right pytree shape). Picks max step if not given (reference
        get_checkpoint_from_dir picks max STEP, helpers.py:31-66)."""
        steps = self.list_steps()
        if not steps:
            return None
        step = steps[-1] if step is None else step
        with open(self._path(step), "rb") as f:
            return flax.serialization.from_bytes(template, f.read())

    def restore_variables(self, variables_template: dict,
                          step: Optional[int] = None) -> Optional[dict]:
        """Restore only {params, batch_stats} from a checkpoint, regardless
        of which optimizer produced its opt_state (for inference/eval)."""
        steps = self.list_steps()
        if not steps:
            return None
        step = steps[-1] if step is None else step
        with open(self._path(step), "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        sub = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
        return flax.serialization.from_state_dict(variables_template, sub)

    def _prune(self):
        steps = self.list_steps()
        for s in steps[: -self.keep] if self.keep > 0 else []:
            try:
                os.remove(self._path(s))
            except OSError:
                pass
