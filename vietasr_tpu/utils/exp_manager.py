"""Experiment manager: work dir, metrics, config snapshots, provenance.

Reference ExpManager (/root/reference/nemo/utils/exp_logging.py:46-214):
timestamped work dir agreed across ranks via broadcast, checkpoint dir,
TensorBoard writer, config copies, argv + git hash dump. Same capabilities,
multi-host-safe via broadcast_string.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from typing import Optional, Sequence


class ExpManager:
    def __init__(
        self,
        work_dir: str,
        *,
        use_timestamp: bool = True,
        make_checkpoint_dir: bool = True,
        use_tensorboard: bool = False,
        config_files: Sequence[str] = (),
    ):
        from vietasr_tpu.parallel.distributed import (broadcast_string,
                                                      is_main_process)

        stamp = time.strftime("%Y-%m-%d_%H-%M-%S") if use_timestamp else ""
        stamp = broadcast_string(stamp)      # all hosts agree on the suffix
        self.work_dir = os.path.join(work_dir, stamp) if stamp else work_dir
        self.is_main = is_main_process()
        os.makedirs(self.work_dir, exist_ok=True)
        self.checkpoint_dir = None
        if make_checkpoint_dir:
            self.checkpoint_dir = os.path.join(self.work_dir, "checkpoints")
            os.makedirs(self.checkpoint_dir, exist_ok=True)

        self._metrics_path = os.path.join(self.work_dir, "metrics.jsonl")
        self._tb = None
        if use_tensorboard and self.is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    log_dir=os.path.join(self.work_dir, "tb"))
            except Exception:
                self._tb = None

        if self.is_main:
            for cf in config_files:
                try:
                    shutil.copy(cf, self.work_dir)
                except OSError:
                    pass
            self._dump_provenance()

    def _dump_provenance(self):
        """argv + git hash/diff (reference exp_logging.py:135-152)."""
        with open(os.path.join(self.work_dir, "cmd-args.log"), "w") as f:
            f.write(" ".join(sys.argv) + "\n")
        try:
            rev = subprocess.run(["git", "rev-parse", "HEAD"],
                                 capture_output=True, text=True,
                                 timeout=10).stdout.strip()
            diff = subprocess.run(["git", "diff"], capture_output=True,
                                  text=True, timeout=10).stdout
            with open(os.path.join(self.work_dir, "git-info.log"), "w") as f:
                f.write(f"commit: {rev}\n\n{diff}")
        except Exception:
            pass

    def log_metrics(self, metrics: dict, step: Optional[int] = None):
        """Append to metrics.jsonl and mirror scalars to TensorBoard."""
        if not self.is_main:
            return
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
        if self._tb is not None and step is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
