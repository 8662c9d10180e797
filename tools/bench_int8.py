"""Measure int8 pointwise-conv serving vs the bf16 path on the real TPU.

Serving shape: QuartzNet12x1_vi, B=16 x 16.7 s bucket (the bench.py
greedy config). Prints per-path ms/step and audio-s/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_int8.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

B = int(os.environ.get("B", 16))
SECS = float(os.environ.get("SECS", 16.7))
SR = 16000


def timeit(fn, sigs, lens, iters=20, warmup=3):
    """Distinct input per iteration, and sync by PULLING A SCALAR —
    block_until_ready does not reliably wait on the tunnel backend
    (ROUND_NOTES gotcha; bench.py's canary does the same)."""
    for i in range(warmup):
        float(jnp.sum(fn(sigs[i % len(sigs)], lens)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(sigs[i % len(sigs)], lens)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def mxu_rates(n=4096, chain=33):
    """Raw MXU rate, bf16 vs int8 (with the realistic requant epilogue the
    serving path uses: int32 acc -> f32 scale -> round/clip -> int8).
    Chain-difference timing cancels the host sync round trip."""

    def timed(fn, x):
        fn(x)
        float(jnp.sum(fn(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    wb = jnp.full((n, n), 0.01, jnp.bfloat16)

    @jax.jit
    def mm_bf16(x):
        for _ in range(chain):
            x = jnp.dot(x, wb, preferred_element_type=jnp.bfloat16) * 1e-3
        return x[0, :8]

    wi = jnp.ones((n, n), jnp.int8)

    @jax.jit
    def mm_int8(x):
        for _ in range(chain):
            acc = jax.lax.dot_general(
                x, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = jnp.clip(jnp.round(acc.astype(jnp.float32) * 1e-5),
                         -127, 127).astype(jnp.int8)
        return x[0, :8]

    xb = jnp.full((n, n), 0.01, jnp.bfloat16)
    xi = jnp.ones((n, n), jnp.int8)
    flops = (chain - 1) * 2 * n ** 3

    @jax.jit
    def mm_bf16_1(x):
        return jnp.dot(x, wb, preferred_element_type=jnp.bfloat16)[0, :8]

    @jax.jit
    def mm_int8_1(x):
        acc = jax.lax.dot_general(x, wi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc[0, :8]

    bf = flops / max(timed(mm_bf16, xb) - timed(mm_bf16_1, xb), 1e-6) / 1e12
    i8 = flops / max(timed(mm_int8, xi) - timed(mm_int8_1, xi), 1e-6) / 1e12
    print(f"mxu  : bf16 {bf:6.0f} TF/s   int8(+requant) {i8:6.0f} TOP/s"
          f"  ({i8/bf:.2f}x)")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    if os.environ.get("MXU_RATES"):
        mxu_rates()
    tr = Transcriber("/root/reference/configs/quartznet12x1_vi.yaml",
                     options=TranscriberOptions(
                         max_batch=B, buckets_seconds=(SECS,)))
    n = int(SECS * SR)
    bl = tr._bucket_len(n)
    rng = np.random.RandomState(0)
    sigs = [jnp.asarray(rng.randn(B, bl).astype(np.float32) * 0.1)
            for _ in range(8)]
    lens = jnp.full((B,), n, jnp.int32)

    dt = timeit(lambda s, l: tr._fwd(s, l)[0], sigs, lens)
    aps = B * SECS / dt
    print(f"bf16 : {dt*1e3:8.2f} ms/step  {aps:10.0f} audio-s/s")

    tr.calibrate_int8([np.asarray(sigs[0][0]), np.asarray(sigs[0][1])])
    dt_q = timeit(lambda s, l: tr._fwd(s, l)[0], sigs, lens)
    aps_q = B * SECS / dt_q
    print(f"int8 : {dt_q*1e3:8.2f} ms/step  {aps_q:10.0f} audio-s/s"
          f"  ({dt/dt_q:.2f}x)")


if __name__ == "__main__":
    main()
