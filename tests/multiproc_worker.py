"""Worker for the TRUE multi-process test (spawned by test_multiprocess.py).

Each worker is a separate OS process with ONE local CPU device; two workers
form a 2-process JAX cluster through a local coordinator — the analogue of
the reference's one-process-per-GPU torch.distributed launch
(/root/reference/nemo/core/neural_factory.py:342-373). Exercises, with
process_count really > 1: initialize_multihost, broadcast_string,
sync_all_processes, per-process manifest sharding, a data-parallel train
step over a cross-process mesh, distributed eval gather, and parameter
synchrony. Writes a JSON result file the parent asserts on.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid_s, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    process_id = int(pid_s)

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # cross-process CPU collectives (gloo) where the jaxlib has it
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from vietasr_tpu.parallel.distributed import (broadcast_string,
                                                  gather_eval_results,
                                                  initialize_multihost,
                                                  sync_all_processes)

    topo = initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=process_id)
    result = {"topo": topo}

    # --- string broadcast: every process must see rank 0's value ---
    value = f"from-rank-{jax.process_index()}"
    result["broadcast"] = broadcast_string(value)

    # --- cooperative health barrier ---
    sync_all_processes(True)

    # --- per-process manifest shard (reference DistributedSampler) ---
    from vietasr_tpu.audio.dataset import BucketBatcher

    class _Entry:
        duration = 1.0

    class _Toy:
        """8 synthetic utterances duck-typing AudioTextDataset; sample i is
        constant-valued i so batches reveal which indices this shard got."""

        sample_rate = 16000
        entries = [_Entry()] * 8

        def __len__(self):
            return 8

        def max_token_len(self):
            return 4

        def __getitem__(self, i):
            return (np.full(16000, float(i), np.float32),
                    np.array([1, 2], np.int32))

    batcher = BucketBatcher(_Toy(), batch_size=2, shuffle=False,
                            shard_id=topo["process_index"],
                            num_shards=topo["process_count"])
    shard = sorted(int(b.signal[r, 0]) for b in batcher
                   for r in range(b.signal.shape[0])
                   if b.signal_lens[r] > 0)
    result["shard"] = shard

    # --- DP train step over a cross-process 2-device mesh ---
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices())          # 2 global devices
    mesh = Mesh(devices, ("data",))

    def loss_fn(params, x, y):
        pred = x @ params["w"] + params["b"]
        return jnp.mean((pred - y) ** 2)

    params = {"w": jnp.ones((4, 2)), "b": jnp.zeros((2,))}
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)             # same data on both; batch
    x_all = rng.randn(8, 4).astype(np.float32)  # rows sharded per process
    y_all = rng.randn(8, 2).astype(np.float32)
    with mesh:
        sharding = NamedSharding(mesh, P("data"))
        local = slice(4 * topo["process_index"],
                      4 * (topo["process_index"] + 1))
        x = jax.make_array_from_process_local_data(sharding, x_all[local],
                                                   x_all.shape)
        y = jax.make_array_from_process_local_data(sharding, y_all[local],
                                                   y_all.shape)
        params_r = jax.device_put(
            params, NamedSharding(mesh, P()))
        for _ in range(3):
            params_r, opt_state, loss = train_step(params_r, opt_state, x, y)
        result["loss"] = float(loss)

    # --- parameter synchrony across processes ---
    w_local = np.asarray(jax.device_get(params_r["w"]))
    gathered = multihost_utils.process_allgather(w_local)
    result["params_in_sync"] = bool(
        np.allclose(gathered[0], gathered[-1], atol=1e-6))

    # --- distributed eval gather: per-process WER counts sum globally ---
    counts = np.asarray([10 + topo["process_index"], 2], np.int64)
    all_counts = gather_eval_results(counts)
    result["gathered_counts"] = np.asarray(all_counts).reshape(-1).tolist()

    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
