"""Tensor parallelism: Conformer sharded over the 'model' axis must match
the replicated computation, on a 2x4 (data, model) virtual mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vietasr_tpu.config import ConformerConfig
from vietasr_tpu.models.conformer import conformer_apply, init_conformer
from vietasr_tpu.parallel import make_mesh, shard_batch
from vietasr_tpu.parallel.tp import conformer_tp_shardings, shard_conformer_variables


@pytest.fixture(scope="module")
def cfg():
    return ConformerConfig(num_blocks=2, d_model=32, num_heads=4,
                           ff_expansion=2, conv_kernel=7,
                           subsampling_channels=8, dropout=0.0)


def test_tp_shardings_assigned(cfg):
    mesh = make_mesh(num_data=2, num_model=4)
    variables = init_conformer(jax.random.PRNGKey(0), cfg, feat_in=16,
                               num_classes=5)
    shardings = conformer_tp_shardings(variables, mesh)
    blk = shardings["params"]["blocks"][0]
    assert blk["ff1"]["in"]["w"].spec == P(None, "model")
    assert blk["ff1"]["out"]["w"].spec == P("model", None)
    assert blk["mhsa"]["q"]["w"].spec == P(None, "model")
    assert blk["mhsa"]["out"]["w"].spec == P("model", None)
    assert blk["conv"]["dw"].spec == P()
    assert shardings["params"]["decoder"]["w"].spec == P()


def test_tp_forward_matches_replicated(cfg):
    mesh = make_mesh(num_data=2, num_model=4)
    variables = init_conformer(jax.random.PRNGKey(0), cfg, feat_in=16,
                               num_classes=5)
    rng = np.random.RandomState(0)
    feats = rng.randn(4, 32, 16).astype(np.float32)
    lens = np.array([32, 20, 32, 8], np.int32)

    want_lp, want_lens, _ = conformer_apply(
        variables, jnp.asarray(feats), jnp.asarray(lens), cfg=cfg)

    sharded_vars = shard_conformer_variables(variables, mesh)
    # verify weights are actually distributed over the model axis
    w = sharded_vars["params"]["blocks"][0]["ff1"]["in"]["w"]
    assert len(w.addressable_shards) == 8
    assert w.addressable_shards[0].data.shape[1] == w.shape[1] // 4

    fwd = jax.jit(lambda v, f, l: conformer_apply(v, f, l, cfg=cfg))
    batch = {"f": jnp.asarray(feats), "l": jnp.asarray(lens)}
    with jax.set_mesh(mesh):
        sb = {
            "f": jax.device_put(batch["f"], NamedSharding(mesh, P("data"))),
            "l": jax.device_put(batch["l"], NamedSharding(mesh, P("data"))),
        }
        got_lp, got_lens, _ = fwd(sharded_vars, sb["f"], sb["l"])

    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(want_lens))
    np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_tp_train_step_runs(cfg):
    from vietasr_tpu.config import (DataConfig, EncoderConfig, ModelConfig,
                                    SpecAugmentConfig)
    from vietasr_tpu.frontend.features import FeaturizerConfig
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import TrainState, make_optimizer, make_train_step
    from vietasr_tpu.train.loop import batch_to_arrays
    from vietasr_tpu.train.synthetic import SyntheticToneDataset

    mesh = make_mesh(num_data=2, num_model=4)
    mcfg = ModelConfig(
        name="tp-conf", labels=[" ", "a", "b", "c"],
        featurizer=FeaturizerConfig(features=16, dither=0.0, pad_to=8),
        encoder=EncoderConfig(blocks=(), feat_in=16),
        spec_augment=SpecAugmentConfig(), data=DataConfig(),
        architecture="conformer", conformer=cfg)
    opt = make_optimizer("adamw", 1e-3)
    variables = model_init(jax.random.PRNGKey(0), mcfg)
    state = TrainState.create(variables, opt)
    # shard params + matching opt state over the model axis
    state = state.replace(
        params=shard_conformer_variables(
            {"params": state.params}, mesh)["params"])

    batch = batch_to_arrays(SyntheticToneDataset().batch(4))
    step = jax.jit(make_train_step(mcfg, opt, use_specaug=False))
    with jax.set_mesh(mesh):
        sb = shard_batch(mesh, batch)
        state, metrics = step(state, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1