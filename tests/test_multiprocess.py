"""TRUE multi-process distributed test: 2 OS processes, 1 CPU device each,
joined via jax.distributed.initialize through a local coordinator.

Everything else in tests/ runs 8 virtual devices in ONE process; this is
the only place initialize_multihost, broadcast_string, sync_all_processes,
per-process manifest sharding, cross-process DP training, and
process_allgather execute with process_count > 1 — the analogue of the
reference's one-process-per-GPU NCCL launch
(/root/reference/nemo/core/neural_factory.py:342-373,
nemo/backends/pytorch/actions.py:584-616).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process; the workers pin jax to cpu in-process
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"result_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err.decode(errors="replace"))
    for p, err in zip(procs, errs):
        assert p.returncode == 0, err[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    for pid, r in enumerate(results):
        assert r["topo"]["process_count"] == 2
        assert r["topo"]["global_devices"] == 2
        assert r["topo"]["local_devices"] == 1
        # rank 0's string won the broadcast on every process
        assert r["broadcast"] == "from-rank-0"
        assert r["params_in_sync"] is True

    # manifest shards are disjoint and cover the dataset
    shard0, shard1 = results[0]["shard"], results[1]["shard"]
    assert not set(shard0) & set(shard1)
    assert sorted(shard0 + shard1) == list(range(8))

    # both processes converged identically (same global batch via psum'd
    # grads) and the eval gather saw both contributions
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
    for r in results:
        assert sorted(r["gathered_counts"]) == sorted([10, 2, 11, 2])
