"""Checkpoint converter tests: a torch model built with the reference's
module structure (MaskedConv1d wrapping nn.Conv1d inside mconv/res
ModuleLists, parts/jasper.py:172-448) is converted and must produce the
same outputs; plus the real bundled decoder checkpoint loads."""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from vietasr_tpu.config import BlockConfig, EncoderConfig
from vietasr_tpu.models import quartznet_apply
from vietasr_tpu.models.convert import (
    decoder_from_state_dict,
    encoder_from_state_dict,
    state_dict_from_variables,
    variables_from_checkpoints,
)

REAL_DECODER = ("/root/reference/models/acoustic_model/vietnamese/"
                "JasperDecoderForCTC-STEP-289936.pt")


class TMasked(nn.Module):
    """Stands in for reference MaskedConv1d: owns `.conv` (same key layout)."""

    def __init__(self, conv):
        super().__init__()
        self.conv = conv


def build_torch_encoder(blocks, feat_in):
    """Reference JasperEncoder module tree (state-dict-compatible)."""
    enc = nn.Sequential()
    cin = feat_in
    for bcfg in blocks:
        block = nn.Module()
        mconv = nn.ModuleList()
        c = cin
        for r in range(bcfg.repeat):
            pad = bcfg.same_padding
            if bcfg.separable:
                mconv.append(TMasked(nn.Conv1d(c, c, bcfg.kernel,
                                               stride=bcfg.stride,
                                               padding=pad,
                                               dilation=bcfg.dilation,
                                               groups=c, bias=False)))
                mconv.append(TMasked(nn.Conv1d(c, bcfg.filters, 1, bias=False)))
            else:
                mconv.append(TMasked(nn.Conv1d(c, bcfg.filters, bcfg.kernel,
                                               stride=bcfg.stride,
                                               padding=pad,
                                               dilation=bcfg.dilation,
                                               bias=False)))
            mconv.append(nn.BatchNorm1d(bcfg.filters, eps=1e-3))
            if r < bcfg.repeat - 1:
                mconv.append(nn.ReLU())
                mconv.append(nn.Dropout(0.0))
            c = bcfg.filters
        block.mconv = mconv
        if bcfg.residual:
            pane = nn.ModuleList([TMasked(nn.Conv1d(cin, bcfg.filters, 1,
                                                    bias=False)),
                                  nn.BatchNorm1d(bcfg.filters, eps=1e-3)])
            block.res = nn.ModuleList([pane])
        enc.append(block)
        cin = bcfg.filters
    model = nn.Module()
    model.encoder = enc
    # randomize BN stats so conversion is non-trivial
    for m in model.modules():
        if isinstance(m, nn.BatchNorm1d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.3
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.rand_like(m.weight) + 0.5
            m.bias.data = torch.randn_like(m.bias) * 0.2
    return model


def torch_forward(model, blocks, x, lens):
    """Reference JasperBlock.forward semantics in torch (eval mode)."""
    model.eval()
    xt = torch.tensor(x).permute(0, 2, 1)
    lt = torch.tensor(lens)

    def mask(z, l):
        m = torch.arange(z.shape[2])[None, :] >= l[:, None]
        return z.masked_fill(m[:, None, :], 0.0)

    for bi, bcfg in enumerate(blocks):
        block = model.encoder[bi]
        out = xt
        lens_b = lt
        for layer in block.mconv:
            if isinstance(layer, TMasked):
                out = mask(out, lens_b)
                out = layer.conv(out)
                c = layer.conv
                lens_b = torch.div(
                    lens_b + 2 * c.padding[0]
                    - c.dilation[0] * (c.kernel_size[0] - 1) - 1,
                    c.stride[0], rounding_mode="floor") + 1
            else:
                out = layer(out)
        if hasattr(block, "res"):
            res = mask(xt, lt)
            res = block.res[0][0].conv(res)
            res = block.res[0][1](res)
            out = out + res
        out = torch.relu(out)
        xt, lt = out, lens_b
    return xt.permute(0, 2, 1).detach().numpy(), lt.numpy()


BLOCKS = (
    BlockConfig(filters=16, repeat=1, kernel=7, stride=2, residual=False,
                separable=True),
    BlockConfig(filters=16, repeat=2, kernel=5, residual=True,
                separable=True, dropout=0.0),
    BlockConfig(filters=24, repeat=1, kernel=5, residual=True,
                separable=False, dropout=0.0),
    BlockConfig(filters=32, repeat=1, kernel=1, residual=False,
                separable=False),
)


def test_converted_encoder_matches_torch_forward():
    torch.manual_seed(0)
    feat_in = 8
    cfg = EncoderConfig(blocks=BLOCKS, feat_in=feat_in, activation="relu")
    model = build_torch_encoder(BLOCKS, feat_in)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    enc = encoder_from_state_dict(sd, cfg)
    # decoder: identity-ish head so we can compare encoder outputs via logits
    rng = np.random.RandomState(0)
    dec_w = rng.randn(32, 5).astype(np.float32)
    dec_b = rng.randn(5).astype(np.float32)
    variables = {
        "params": {"encoder": enc["params"],
                   "decoder": {"w": jnp.asarray(dec_w),
                               "b": jnp.asarray(dec_b)}},
        "batch_stats": {"encoder": enc["batch_stats"]},
    }

    x = rng.randn(2, 40, feat_in).astype(np.float32)
    lens = np.array([40, 23], np.int32)
    log_probs, out_lens, _ = quartznet_apply(
        variables, jnp.asarray(x), jnp.asarray(lens), cfg=cfg)

    enc_out, want_lens = torch_forward(model, BLOCKS, x, lens)
    logits = enc_out @ dec_w + dec_b
    want_lp = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()

    np.testing.assert_array_equal(np.asarray(out_lens), want_lens)
    np.testing.assert_allclose(np.asarray(log_probs), want_lp,
                               atol=1e-4, rtol=1e-4)


def test_state_dict_roundtrip():
    torch.manual_seed(1)
    feat_in = 8
    cfg = EncoderConfig(blocks=BLOCKS, feat_in=feat_in)
    model = build_torch_encoder(BLOCKS, feat_in)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    enc = encoder_from_state_dict(sd, cfg)
    variables = {
        "params": {"encoder": enc["params"],
                   "decoder": {"w": jnp.zeros((32, 5)), "b": jnp.zeros(5)}},
        "batch_stats": {"encoder": enc["batch_stats"]},
    }
    back = state_dict_from_variables(variables, cfg)
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(back[k], v, atol=1e-6, err_msg=k)


@pytest.mark.skipif(not os.path.exists(REAL_DECODER),
                    reason="bundled decoder checkpoint absent")
def test_real_decoder_checkpoint_loads():
    from vietasr_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(REAL_DECODER)
    dec = decoder_from_state_dict(sd)
    assert dec["w"].shape == (1024, 91)   # 90 labels + blank
    assert dec["b"].shape == (91,)
    assert np.isfinite(np.asarray(dec["w"])).all()
