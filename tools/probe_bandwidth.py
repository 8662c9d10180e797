"""Bound the ~240 GB/s effective-HBM-bandwidth question (VERDICT r3 #9).

The v5e datasheet HBM bandwidth is ~819 GB/s; round 2 measured ~240 GB/s
effective on an f32 copy through the tunnel-attached chip, and two
rooflines (int8 serving, 15x5) inherit that number. Measurement design:
a single short op is swamped by the tunnel's ~40 ms dispatch jitter (a
first cut of this probe produced pure noise), so like the MXU canary we
time the DIFFERENCE of a 1-pass and a 33-pass DEPENDENT chain compiled
into one program:

1. XLA elementwise passes: y = barrier(y + 1) repeated — the
   optimization barrier stops XLA fusing the chain into one pass, so
   each link reads + writes the full array in HBM (2 x bytes).
2. Pallas pass chain: each link is an opaque pallas_call tile copy
   (HBM -> VMEM -> HBM), measuring the Mosaic DMA path.

If both plateau at the same value for sizes >= 64 MB, that is the real
effective ceiling programs see (the chain difference cancels fixed
latency). Run on a quiet chip; rooflines §8 records the result.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _canary_tfs, wait_for_quiet_chip

LO, HI = 1, 33


def _chain_time(make_fn, x, n, trials=3):
    fn = make_fn(n)
    jax.device_get(jax.tree_util.tree_leaves(fn(x))[0][0])   # compile+warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(x)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][0])
        best = min(best, time.perf_counter() - t0)
    return best


def xla_passes_bw(n_bytes: int):
    n = n_bytes // 4
    x = jnp.zeros((n // 128, 128), jnp.float32)

    def make(links):
        def f(x):
            y = x
            for _ in range(links):
                y = jax.lax.optimization_barrier(y + 1.0)
            return y
        return jax.jit(f)

    dt = _chain_time(make, x, HI) - _chain_time(make, x, LO)
    return (HI - LO) * 2 * n_bytes / max(dt, 1e-9) / 1e9


def pallas_passes_bw(n_bytes: int, tile_rows: int = 1024):
    from jax.experimental import pallas as pl

    lanes = 128
    rows = n_bytes // 4 // lanes // tile_rows * tile_rows
    x = jnp.zeros((rows, lanes), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    copy = pl.pallas_call(
        kernel,
        grid=(rows // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )

    def make(links):
        def f(x):
            y = x
            for _ in range(links):
                y = copy(y)
            return y
        return jax.jit(f)

    nb = rows * lanes * 4
    dt = _chain_time(make, x, HI) - _chain_time(make, x, LO)
    return (HI - LO) * 2 * nb / max(dt, 1e-9) / 1e9


def main():
    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    canary = wait_for_quiet_chip()
    print(json.dumps({"canary_tfs": round(canary, 1)}), flush=True)
    for mb in [16, 64, 256]:
        nb = mb * 1024 * 1024
        xb = xla_passes_bw(nb)
        pb = pallas_passes_bw(nb)
        print(json.dumps({"size_mb": mb,
                          "xla_pass_gbs": round(xb, 1),
                          "pallas_dma_gbs": round(pb, 1)}), flush=True)
    print(json.dumps({"canary_tfs_after": round(_canary_tfs(), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
