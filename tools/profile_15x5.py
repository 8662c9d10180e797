"""Attribute the QuartzNet15x5 serving gap with per-block measurements.

VERDICT r4 weak #1 / next #3: 15x5 batched greedy runs 17.2k audio-s/s
(MFU 0.171). At the corrected ~620 GB/s HBM bandwidth its traffic-bound
roofline moved to ~44k, so the number is no longer bandwidth-justified;
the fused-repeat-block kernel attack was measured and refuted (0.26x
XLA, rooflines §2b). This tool buckets where the time actually goes:

  1. PREFIX DIFFERENCES: jit the featurizer + the first N encoder blocks
     for N = 0..15 (+decoder); the deltas are per-block device times
     inclusive of XLA's cross-block fusion decisions at each boundary.
  2. COMPONENT MICROBENCHES at each distinct block shape: standalone
     depthwise conv (VPU), standalone pointwise conv (MXU), standalone
     BN+ReLU epilogue. Per-block residual = block delta - (dw + pw +
     epi) ~ layout/fusion overhead.
  3. ROOFLINES per bucket: MXU bf16 197 TF/s, VPU ~23k ops-lane-limited,
     HBM ~620 GB/s (docs/rooflines.md revised numbers) -> which line
     each bucket sits on.

Writes work/profile_15x5.json and prints one JSON line per bucket.
Run on the real chip (needs ~2 min including cached compiles).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG_15x5 = "/root/reference/configs/quartznet15x5.yaml"
SECONDS = 15.0
SR = 16000


def _timeit(fn, *args, iters=10, trials=3, base=2):
    import jax

    def pull(out):
        jax.device_get(jax.tree_util.tree_leaves(out)[0])

    pull(fn(*args))

    def run_once(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        pull(out)
        return time.perf_counter() - t0

    lows = [run_once(base) for _ in range(trials)]
    highs = [run_once(base + iters) for _ in range(trials)]
    return max((min(highs) - min(lows)) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="work/profile_15x5.json")
    args = ap.parse_args()

    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vietasr_tpu.config import load_config
    from vietasr_tpu.frontend.features import make_featurizer
    from vietasr_tpu.models import fold_batchnorm, init_quartznet
    from vietasr_tpu.models.layers import depthwise_conv1d, pointwise_conv
    from vietasr_tpu.models.quartznet import _apply_block

    cfg = load_config(CONFIG_15x5)
    enc = cfg.encoder
    variables = fold_batchnorm(
        init_quartznet(jax.random.PRNGKey(0), enc, cfg.num_classes), enc)
    featurize = make_featurizer(cfg.featurizer)
    b = args.batch
    n = int(SECONDS * SR)
    rng = np.random.RandomState(0)
    signal = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1)
    lens = jnp.asarray(np.full((b,), n, np.int32))
    dt = jnp.bfloat16

    # ---- 1. prefix differences ------------------------------------------
    def make_prefix(n_blocks):
        @jax.jit
        def fwd(variables, signal, lens):
            feats, flens = featurize(signal, lens)
            xs, l = [feats.astype(dt)], flens
            stats = variables["batch_stats"]["encoder"]
            for i, bcfg in enumerate(enc.blocks[:n_blocks]):
                xs, l, _ = _apply_block(
                    xs, l, variables["params"]["encoder"][i], stats[i],
                    bcfg, enc, training=False, rng=jax.random.PRNGKey(0),
                    compute_dtype=dt)
            # small leaf first for the tunnel-safe pull
            return l, xs[-1].sum()

        return fwd

    times = []
    for nb in range(len(enc.blocks) + 1):
        t = _timeit(make_prefix(nb), variables, signal, lens)
        times.append(t)
        print(json.dumps({"prefix_blocks": nb, "ms": round(t * 1e3, 3)}),
              flush=True)
    deltas = [times[i + 1] - times[i] for i in range(len(enc.blocks))]

    # ---- 2. component microbenches per distinct shape -------------------
    # collect (T, C_in, C_out, K, repeat, stride) per block from configs
    feat_t = int(np.ceil(n / cfg.featurizer.hop_length))
    feat_t += (-feat_t) % max(cfg.featurizer.pad_to, 1)
    shapes = []
    t_cur, c_cur = feat_t, enc.feat_in
    for bcfg in enc.blocks:
        t_out = (t_cur + bcfg.stride - 1) // bcfg.stride
        shapes.append((t_cur, t_out, c_cur, bcfg.filters,
                       bcfg.effective_kernel, bcfg.repeat, bcfg.stride,
                       bcfg.separable))
        t_cur, c_cur = t_out, bcfg.filters
    comp = []
    cache = {}
    for (t_in, t_out, c_in, c_out, k, rep, stride, sep) in shapes:
        key = (t_in, c_in, c_out, k, stride, sep)
        if key not in cache:
            x = jnp.asarray(
                rng.randn(b, t_in, c_in).astype(np.float32)).astype(dt)
            if sep:
                dw_w = jnp.asarray(
                    rng.randn(k, c_in).astype(np.float32)).astype(dt)
                pw_w = jnp.asarray(
                    rng.randn(c_in, c_out).astype(np.float32)).astype(dt)

                @jax.jit
                def dw_only(x, w):
                    y = depthwise_conv1d(x, w, stride=stride)
                    return y.sum(), y

                @jax.jit
                def pw_only(x, w):
                    y = pointwise_conv(x[:, ::stride] if stride > 1 else x,
                                      w)
                    return y.sum(), y

                t_dw = _timeit(dw_only, x, dw_w)
                t_pw = _timeit(pw_only, x, pw_w)
            else:
                w = jnp.asarray(rng.randn(k, c_in, c_out)
                                .astype(np.float32)).astype(dt)

                @jax.jit
                def dense_only(x, w):
                    import jax as _j
                    y = _j.lax.conv_general_dilated(
                        x, w, (stride,), "SAME",
                        dimension_numbers=("NWC", "WIO", "NWC"))
                    return y.sum(), y

                t_dw, t_pw = 0.0, _timeit(dense_only, x, w)
            cache[key] = (t_dw, t_pw)
        comp.append(cache[key])

    out_rows = []
    tot_dw = tot_pw = tot_res = 0.0
    for i, ((t_in, t_out, c_in, c_out, k, rep, stride, sep), (t_dw, t_pw),
            delta) in enumerate(zip(shapes, comp, deltas)):
        # repeats: sub-block 0 is (c_in->c_out); repeats 1.. are
        # (c_out->c_out) — approximate with the same measured pair
        # scaled by channel ratio for repeat sub-blocks
        scale = (c_out / max(c_in, 1))
        dw_t = t_dw + (rep - 1) * t_dw * scale
        pw_t = t_pw + (rep - 1) * t_pw * scale
        resid = delta - dw_t - pw_t
        tot_dw += dw_t
        tot_pw += pw_t
        tot_res += resid
        row = {"block": i, "T": t_in, "Cin": c_in, "Cout": c_out, "K": k,
               "repeat": rep, "delta_ms": round(delta * 1e3, 3),
               "dw_ms": round(dw_t * 1e3, 3),
               "pw_ms": round(pw_t * 1e3, 3),
               "residual_ms": round(resid * 1e3, 3)}
        out_rows.append(row)
        print(json.dumps(row), flush=True)

    total = times[-1]
    summary = {
        "batch": b, "seconds": SECONDS,
        "total_ms": round(total * 1e3, 3),
        "featurizer_ms": round(times[0] * 1e3, 3),
        "blocks_ms": round(sum(deltas) * 1e3, 3),
        "bucket_depthwise_ms": round(tot_dw * 1e3, 3),
        "bucket_pointwise_ms": round(tot_pw * 1e3, 3),
        "bucket_residual_ms": round(tot_res * 1e3, 3),
        "audio_s_per_s": round(b * SECONDS / total, 1),
    }
    print(json.dumps(summary), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "blocks": out_rows,
                   "prefix_ms": [round(t * 1e3, 3) for t in times]}, f,
                  indent=1)


if __name__ == "__main__":
    main()
