"""Layer-level parity tests vs torch oracles."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vietasr_tpu.models.layers import (
    batchnorm_apply,
    conv_out_length,
    dense_conv1d,
    depthwise_conv1d,
    fold_bn_into_conv,
    group_shuffle,
    init_batchnorm,
    mask_padding,
)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    b, t, c, k = 2, 50, 8, 5
    x = rng.randn(b, t, c).astype(np.float32)
    w = rng.randn(k, c).astype(np.float32)
    got = depthwise_conv1d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=2)
    # torch: (B, C, T), weight (C, 1, K)
    xt = torch.tensor(x).permute(0, 2, 1)
    wt = torch.tensor(w).permute(1, 0).unsqueeze(1)
    want = F.conv1d(xt, wt, stride=2, padding=2, groups=c).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_dense_conv_with_dilation_matches_torch():
    rng = np.random.RandomState(2)
    b, t, cin, cout, k, d = 2, 40, 6, 10, 7, 2
    pad = (d * k) // 2 - 1
    x = rng.randn(b, t, cin).astype(np.float32)
    w = rng.randn(k, cin, cout).astype(np.float32)
    got = dense_conv1d(jnp.asarray(x), jnp.asarray(w), dilation=d, padding=pad)
    xt = torch.tensor(x).permute(0, 2, 1)
    wt = torch.tensor(w).permute(2, 1, 0)
    want = F.conv1d(xt, wt, dilation=d, padding=pad).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    assert got.shape == tuple(want.shape)


def test_conv_out_length_matches_torch_formula():
    # floor((len + 2p - d(k-1) - 1)/s) + 1 across a sweep
    for lens, k, s, d in [(101, 33, 2, 1), (100, 33, 2, 1), (57, 39, 1, 1),
                          (64, 87, 1, 2), (16, 1, 1, 1)]:
        p = (d * k) // 2 - 1 if d > 1 else k // 2
        want = int(np.floor((lens + 2 * p - d * (k - 1) - 1) / s) + 1)
        got = int(conv_out_length(jnp.array(lens), k, s, d, p))
        assert got == want, (lens, k, s, d)


def test_batchnorm_eval_matches_torch():
    rng = np.random.RandomState(3)
    b, t, c = 3, 20, 16
    x = rng.randn(b, t, c).astype(np.float32)
    params, stats = init_batchnorm(c)
    params = {"scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(c).astype(np.float32))}
    stats = {"mean": jnp.asarray(rng.randn(c).astype(np.float32)),
             "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}
    got, _ = batchnorm_apply(jnp.asarray(x), params, stats, training=False)

    bn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.1)
    bn.weight.data = torch.tensor(np.asarray(params["scale"]))
    bn.bias.data = torch.tensor(np.asarray(params["bias"]))
    bn.running_mean.data = torch.tensor(np.asarray(stats["mean"]))
    bn.running_var.data = torch.tensor(np.asarray(stats["var"]))
    bn.eval()
    want = bn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_batchnorm_train_matches_torch():
    rng = np.random.RandomState(4)
    b, t, c = 4, 10, 8
    x = rng.randn(b, t, c).astype(np.float32) * 2 + 1
    params, stats = init_batchnorm(c)
    got, new_stats = batchnorm_apply(jnp.asarray(x), params, stats, training=True)

    bn = torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.1)
    bn.train()
    want = bn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               bn.running_var.numpy(), atol=1e-4)


def test_fold_bn_matches_eval_bn():
    rng = np.random.RandomState(5)
    c_in, c_out, k = 6, 12, 1
    x = jnp.asarray(rng.randn(2, 9, c_in).astype(np.float32))
    w = jnp.asarray(rng.randn(c_in, c_out).astype(np.float32))
    params = {"scale": jnp.asarray(rng.rand(c_out).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(c_out).astype(np.float32))}
    stats = {"mean": jnp.asarray(rng.randn(c_out).astype(np.float32)),
             "var": jnp.asarray(rng.rand(c_out).astype(np.float32) + 0.5)}
    y1 = jnp.einsum("btc,cd->btd", x, w)
    y1, _ = batchnorm_apply(y1, params, stats, training=False)
    wf, bf = fold_bn_into_conv(w, params, stats)
    y2 = jnp.einsum("btc,cd->btd", x, wf) + bf
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_group_shuffle_matches_torch():
    rng = np.random.RandomState(6)
    b, t, c, g = 2, 5, 12, 3
    x = rng.randn(b, t, c).astype(np.float32)
    got = group_shuffle(jnp.asarray(x), g)
    xt = torch.tensor(x).permute(0, 2, 1)  # (B, C, T)
    sh = xt.shape
    want = (xt.view(-1, g, c // g, sh[-1]).transpose(1, 2).contiguous()
            .view(-1, c, sh[-1]).permute(0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_mask_padding():
    x = jnp.ones((2, 5, 3))
    out = mask_padding(x, jnp.array([3, 5]))
    assert np.all(np.asarray(out)[0, 3:] == 0)
    assert np.all(np.asarray(out)[1] == 1)
