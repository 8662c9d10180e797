"""Data parallelism on the virtual 8-device CPU mesh: a sharded train step
must compute the same global result as the unsharded one (DDP-allreduce
equivalence), and collectives must actually run."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vietasr_tpu.models import init_quartznet
from vietasr_tpu.parallel import (
    data_parallel_shardings,
    make_mesh,
    replicate,
    shard_batch,
)
from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
from vietasr_tpu.train.loop import batch_to_arrays

from test_train import SynthBatch, tiny_config


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(num_data=4, num_model=2)
    assert mesh2.devices.shape == (4, 2)


def test_sharded_train_step_matches_single_device():
    cfg = tiny_config()
    opt = make_optimizer("sgd", 0.05)
    variables = init_quartznet(jax.random.PRNGKey(0), cfg.encoder,
                               cfg.num_classes)
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0), b=8))
    rng = jax.random.PRNGKey(7)
    step_fn = make_train_step(cfg, opt, use_specaug=False)

    # single-device result
    s0 = TrainState.create(variables, opt)
    s0, m0 = jax.jit(step_fn)(s0, batch, rng)

    # 8-way data parallel
    mesh = make_mesh()
    s1 = TrainState.create(variables, opt)
    s1 = replicate(mesh, s1)
    sharded_batch = shard_batch(mesh, batch)
    with jax.set_mesh(mesh):
        s1, m1 = jax.jit(step_fn)(s1, sharded_batch, rng)

    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-4
    w0 = np.asarray(s0.params["decoder"]["w"])
    w1 = np.asarray(s1.params["decoder"]["w"])
    np.testing.assert_allclose(w0, w1, atol=1e-4)


def test_batch_actually_sharded():
    mesh = make_mesh()
    batch = batch_to_arrays(SynthBatch(np.random.RandomState(0), b=8))
    sb = shard_batch(mesh, batch)
    shards = sb["signal"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 1   # 8 rows over 8 devices


def test_psum_over_mesh():
    """Explicit collective sanity on the virtual mesh via shard_map."""
    from jax import shard_map

    mesh = make_mesh()
    x = jnp.arange(8.0)

    def f(x):
        return jax.lax.psum(x, axis_name="data")

    y = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())(x)
    np.testing.assert_allclose(np.asarray(y), [28.0])
