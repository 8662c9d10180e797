"""Checkpoint converter: reference PyTorch `.pt` state_dicts -> our pytrees.

The reference saves per-module state_dicts named
`JasperEncoder-STEP-{n}.pt` / `JasperDecoderForCTC-STEP-{n}.pt`
(nemo/backends/pytorch/nm.py:92-103, nemo/core/callbacks.py:283-286). Key
layout (from the reference module structure, parts/jasper.py:172-448):

  encoder.{b}.mconv.{i}.conv.weight      MaskedConv1d wraps nn.Conv1d
  encoder.{b}.mconv.{i}.{weight,bias,running_mean,running_var,...}   BN
  encoder.{b}.res.{p}.{0}.conv.weight    residual 1x1 conv
  encoder.{b}.res.{p}.{1}.*              residual BN
  decoder_layers.0.{weight,bias}         CTC head 1x1 conv

mconv indices: each repeat contributes [conv, (pointwise conv), BN] then
[activation, dropout] between repeats — activation/dropout own no params but
DO consume indices, so the stride is 5 per repeat for separable blocks and
4 for dense blocks.

Weight layout conversion (torch OIW -> ours):
  depthwise (C, 1, K)        -> (K, C)
  pointwise (Cout, Cin, 1)   -> (Cin, Cout)
  dense     (Cout, Cin/g, K) -> (K, Cin/g, Cout)
  head      (V, C, 1)        -> (C, V)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from vietasr_tpu.config import BlockConfig, EncoderConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt checkpoint into numpy without keeping torch tensors around."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _bn_from(sd: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
              "bias": jnp.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
             "var": jnp.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def encoder_from_state_dict(sd: Mapping[str, np.ndarray],
                            cfg: EncoderConfig) -> dict:
    """Build {"params": {"encoder": ...}, "batch_stats": {...}} from a
    reference JasperEncoder state_dict."""
    enc_params = []
    enc_stats = []
    feat_in = cfg.feat_in
    residual_panes = []
    for b, bcfg in enumerate(cfg.blocks):
        if bcfg.se:
            raise NotImplementedError(
                "squeeze-excite checkpoints not supported by the converter yet")
        bp: dict = {"sub": [], "res": [], "se": []}
        bs: dict = {"sub": [], "res": []}
        stride = 5 if bcfg.separable else 4
        for r in range(bcfg.repeat):
            base = r * stride
            sub: dict = {}
            if bcfg.separable:
                dw = sd[f"encoder.{b}.mconv.{base}.conv.weight"]   # (C,1,K)
                sub["dw_w"] = jnp.asarray(dw[:, 0, :].T)           # (K,C)
                pw = sd[f"encoder.{b}.mconv.{base+1}.conv.weight"]  # (Co,Ci,1)
                if bcfg.groups > 1:
                    sub["pw_w"] = jnp.asarray(pw.transpose(2, 1, 0))
                else:
                    sub["pw_w"] = jnp.asarray(pw[:, :, 0].T)       # (Ci,Co)
                bn_idx = base + 2
            else:
                w = sd[f"encoder.{b}.mconv.{base}.conv.weight"]    # (Co,Ci,K)
                sub["conv_w"] = jnp.asarray(w.transpose(2, 1, 0))  # (K,Ci,Co)
                bn_idx = base + 1
            sub["bn"], bn_stats = _bn_from(sd, f"encoder.{b}.mconv.{bn_idx}")
            bp["sub"].append(sub)
            bs["sub"].append({"bn": bn_stats})
        if bcfg.residual_dense:
            residual_panes.append(feat_in)
            n_panes = len(residual_panes)
        elif bcfg.residual:
            n_panes = 1
        else:
            n_panes = 0
        for p in range(n_panes):
            rw = sd[f"encoder.{b}.res.{p}.0.conv.weight"]          # (Co,Ci,1)
            pane = {"conv_w": jnp.asarray(rw[:, :, 0].T)}
            pane["bn"], pane_stats = _bn_from(sd, f"encoder.{b}.res.{p}.1")
            bp["res"].append(pane)
            bs["res"].append({"bn": pane_stats})
        enc_params.append(bp)
        enc_stats.append(bs)
        feat_in = bcfg.filters
    return {"params": enc_params, "batch_stats": enc_stats}


def decoder_from_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    w = sd["decoder_layers.0.weight"]                              # (V, C, 1)
    b = sd["decoder_layers.0.bias"]
    return {"w": jnp.asarray(w[:, :, 0].T), "b": jnp.asarray(b)}


def variables_from_checkpoints(encoder_path: str, decoder_path: str,
                               cfg: EncoderConfig) -> dict:
    """Assemble full model variables from the two reference checkpoint files
    (the layout infer.py:142-143 restores)."""
    enc_sd = load_torch_state_dict(encoder_path)
    dec_sd = load_torch_state_dict(decoder_path)
    enc = encoder_from_state_dict(enc_sd, cfg)
    return {
        "params": {"encoder": enc["params"],
                   "decoder": decoder_from_state_dict(dec_sd)},
        "batch_stats": {"encoder": enc["batch_stats"]},
    }


def state_dict_from_variables(variables: dict, cfg: EncoderConfig
                              ) -> Dict[str, np.ndarray]:
    """Inverse conversion (ours -> reference key layout), for round-trip
    tests and for exporting checkpoints usable by the reference stack."""
    out: Dict[str, np.ndarray] = {}
    enc = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    for b, bcfg in enumerate(cfg.blocks):
        stride = 5 if bcfg.separable else 4
        for r in range(bcfg.repeat):
            base = r * stride
            sub = enc[b]["sub"][r]
            sub_stats = stats[b]["sub"][r]
            if bcfg.separable:
                dw = np.asarray(sub["dw_w"]).T[:, None, :]
                out[f"encoder.{b}.mconv.{base}.conv.weight"] = dw
                pw = np.asarray(sub["pw_w"])
                if pw.ndim == 3:
                    out[f"encoder.{b}.mconv.{base+1}.conv.weight"] = \
                        pw.transpose(2, 1, 0)
                else:
                    out[f"encoder.{b}.mconv.{base+1}.conv.weight"] = \
                        pw.T[:, :, None]
                bn_idx = base + 2
            else:
                out[f"encoder.{b}.mconv.{base}.conv.weight"] = \
                    np.asarray(sub["conv_w"]).transpose(2, 1, 0)
                bn_idx = base + 1
            pre = f"encoder.{b}.mconv.{bn_idx}"
            out[f"{pre}.weight"] = np.asarray(sub["bn"]["scale"])
            out[f"{pre}.bias"] = np.asarray(sub["bn"]["bias"])
            out[f"{pre}.running_mean"] = np.asarray(sub_stats["bn"]["mean"])
            out[f"{pre}.running_var"] = np.asarray(sub_stats["bn"]["var"])
        for p, pane in enumerate(enc[b]["res"]):
            out[f"encoder.{b}.res.{p}.0.conv.weight"] = \
                np.asarray(pane["conv_w"]).T[:, :, None]
            pre = f"encoder.{b}.res.{p}.1"
            out[f"{pre}.weight"] = np.asarray(pane["bn"]["scale"])
            out[f"{pre}.bias"] = np.asarray(pane["bn"]["bias"])
            out[f"{pre}.running_mean"] = \
                np.asarray(stats[b]["res"][p]["bn"]["mean"])
            out[f"{pre}.running_var"] = \
                np.asarray(stats[b]["res"][p]["bn"]["var"])
    dec = variables["params"]["decoder"]
    out["decoder_layers.0.weight"] = np.asarray(dec["w"]).T[:, :, None]
    out["decoder_layers.0.bias"] = np.asarray(dec["b"])
    return out
