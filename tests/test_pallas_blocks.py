"""Fused Pallas separable-block kernel vs the XLA path (interpret mode on
CPU; the same comparison ran bit-identical on the real v5e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietasr_tpu.models.layers import (depthwise_conv1d, mask_padding,
                                       pointwise_conv)
from vietasr_tpu.ops.pallas_blocks import block_is_fusable, fused_separable_block


def _xla_oracle(x, lens, dw, pw, pwb, rw, rb, k):
    xm = mask_padding(x, lens)
    y = depthwise_conv1d(xm, dw, padding=k // 2)
    y = mask_padding(y, lens)
    y = pointwise_conv(y, pw) + pwb
    r = pointwise_conv(xm, rw) + rb
    return jnp.maximum(y + r, 0.0)


@pytest.mark.slow
def test_fused_block_matches_xla_interpret():
    rng = np.random.RandomState(0)
    b, t, c, k, cout = 2, 64, 16, 7, 24
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.3)
    lens = jnp.asarray(np.array([t, 40], np.int32))
    dw = jnp.asarray(rng.randn(k, c).astype(np.float32) * 0.2)
    pw = jnp.asarray(rng.randn(c, cout).astype(np.float32) * 0.2)
    pwb = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    rw = jnp.asarray(rng.randn(c, cout).astype(np.float32) * 0.2)
    rb = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    xm = mask_padding(x, lens)
    got = fused_separable_block(xm, lens, dw, pw, pwb, rw, rb,
                                interpret=True)
    want = _xla_oracle(x, lens, dw, pw, pwb, rw, rb, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_quartznet_use_pallas_flag_matches(monkeypatch):
    """use_pallas=True through quartznet_apply (interpret-mode kernel) must
    match the XLA path on the folded model."""
    import vietasr_tpu.ops.pallas_blocks as pb
    from vietasr_tpu.config import BlockConfig, EncoderConfig
    from vietasr_tpu.models import fold_batchnorm, init_quartznet, quartznet_apply

    orig = pb.fused_separable_block

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pb, "fused_separable_block", interp)

    blocks = (
        BlockConfig(filters=16, repeat=1, kernel=9, stride=2, residual=False,
                    separable=True),
        BlockConfig(filters=16, repeat=1, kernel=7, residual=True,
                    separable=True),
        BlockConfig(filters=24, repeat=1, kernel=1, residual=False),
    )
    cfg = EncoderConfig(blocks=blocks, feat_in=8)
    variables = fold_batchnorm(
        init_quartznet(jax.random.PRNGKey(0), cfg, num_classes=4), cfg)
    assert block_is_fusable(blocks[1], variables["params"]["encoder"][1])

    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 8)
                    .astype(np.float32))
    lens = jnp.array([32, 20], jnp.int32)
    lp_x, l_x, _ = quartznet_apply(variables, x, lens, cfg=cfg)
    lp_p, l_p, _ = quartznet_apply(variables, x, lens, cfg=cfg,
                                   use_pallas=True)
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_p))
    np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_p),
                               atol=1e-4, rtol=1e-4)
