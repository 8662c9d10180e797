"""Benchmark: greedy-inference throughput of QuartzNet12x1_vi on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N}

- value: audio-seconds transcribed per wall-second on the default JAX device
  (the real TPU chip under the driver), batch 16 x 15 s, featurizer +
  folded-BN encoder + CTC head + greedy argmax, all in one jitted program.
- vs_baseline: against a reference-equivalent PyTorch CPU forward (same
  architecture/weights semantics as the reference NeMo stack runs on CPU,
  its documented deployment: torch==1.8.1+cpu per README.md:38-42).
  The torch number is measured once and cached in .bench_baseline.json.
"""

import json
import os
import time

import numpy as np

BATCH = 128
SECONDS = 15
SR = 16000
CONFIG = "/root/reference/configs/quartznet12x1_vi.yaml"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from vietasr_tpu.config import load_config
    from vietasr_tpu.frontend.features import make_featurizer
    from vietasr_tpu.models import fold_batchnorm, init_quartznet, quartznet_apply

    cfg = load_config(CONFIG)
    variables = fold_batchnorm(
        init_quartznet(jax.random.PRNGKey(0), cfg.encoder, cfg.num_classes),
        cfg.encoder)
    featurize = make_featurizer(cfg.featurizer)

    @jax.jit
    def fwd(variables, signal, lengths):
        feats, flens = featurize(signal, lengths)
        log_probs, enc_lens, _ = quartznet_apply(
            variables, feats, flens, cfg=cfg.encoder,
            compute_dtype=jnp.bfloat16)
        preds = jnp.argmax(log_probs, axis=-1)
        return preds, enc_lens

    rng = np.random.RandomState(0)
    signal = jnp.asarray(rng.randn(BATCH, SECONDS * SR).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.full((BATCH,), SECONDS * SR, np.int32))

    # warmup / compile
    fwd(variables, signal, lengths)[0].block_until_ready()
    fwd(variables, signal, lengths)[0].block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        preds, _ = fwd(variables, signal, lengths)
    preds.block_until_ready()
    wall = time.perf_counter() - t0
    return BATCH * SECONDS * iters / wall


def measure_torch_cpu_baseline() -> float:
    """Reference-equivalent torch CPU forward (featurizer + QuartzNet12x1)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["audio_sec_per_sec"]

    import torch
    import torch.nn as nn

    from vietasr_tpu.config import load_config
    from vietasr_tpu.frontend.mel import mel_filterbank

    cfg = load_config(CONFIG)
    torch.set_num_threads(os.cpu_count() or 2)

    # QuartzNet12x1 exactly as the reference builds it (eval mode, masked
    # convs reduce to plain convs for full-length input)
    layers_meta = []
    blocks = []
    cin = cfg.featurizer.features
    for b in cfg.encoder.blocks:
        mods = []
        if b.separable:
            mods.append(nn.Conv1d(cin, cin, b.effective_kernel,
                                  stride=b.stride, padding=b.same_padding,
                                  dilation=b.dilation, groups=cin, bias=False))
            mods.append(nn.Conv1d(cin, b.filters, 1, bias=False))
        else:
            mods.append(nn.Conv1d(cin, b.filters, b.effective_kernel,
                                  stride=b.stride, padding=b.same_padding,
                                  dilation=b.dilation, bias=False))
        mods.append(nn.BatchNorm1d(b.filters, eps=1e-3))
        res = nn.Sequential(nn.Conv1d(cin, b.filters, 1, bias=False),
                            nn.BatchNorm1d(b.filters, eps=1e-3)) \
            if b.residual else None
        blocks.append((nn.Sequential(*mods), res))
        layers_meta.append(b)
        cin = b.filters
    head = nn.Conv1d(cin, cfg.num_classes + 1, 1)

    mel_fb = torch.tensor(mel_filterbank(SR, 512, 64))
    window = torch.hann_window(320, periodic=False)

    @torch.no_grad()
    def forward(x):
        x = torch.cat((x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]), dim=1)
        spec = torch.stft(x, n_fft=512, hop_length=160, win_length=320,
                          center=True, window=window, return_complex=True)
        power = spec.real ** 2 + spec.imag ** 2
        feats = torch.log(mel_fb @ power + 2.0 ** -24)
        mean = feats.mean(dim=2, keepdim=True)
        std = feats.std(dim=2, keepdim=True) + 1e-5
        out = (feats - mean) / std
        for (seq, res), meta in zip(blocks, layers_meta):
            y = seq(out)
            if res is not None:
                y = y + res(out)
            out = torch.relu(y)
        return torch.log_softmax(head(out).transpose(1, 2), dim=-1).argmax(-1)

    for m in [head] + [s for s, _ in blocks] + \
            [r for _, r in blocks if r is not None]:
        m.eval()

    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(4, SECONDS * SR).astype(np.float32) * 0.1)
    forward(x)  # warmup
    t0 = time.perf_counter()
    forward(x)
    wall = time.perf_counter() - t0
    value = 4 * SECONDS / wall
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"audio_sec_per_sec": value,
                   "note": "torch CPU reference-equivalent fwd, "
                           f"{os.cpu_count()} threads"}, f)
    return value


def main():
    baseline = measure_torch_cpu_baseline()
    value = measure_tpu()
    print(json.dumps({
        "metric": "greedy_inference_throughput_quartznet12x1_vi",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
