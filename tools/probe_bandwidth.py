"""Bound the ~240 GB/s effective-HBM-bandwidth question (VERDICT r3 #9).

The v5e datasheet HBM bandwidth is ~819 GB/s; round 2 measured ~240 GB/s
effective on an f32 copy through the tunnel-attached chip, and two
rooflines (int8 serving, 15x5) inherit that number. This probe separates
"tunnel artifact" from "real ceiling" with three measurements, each at
several transfer sizes:

1. XLA copy (y = x + 1 into a donated buffer): reads + writes HBM, so
   bandwidth = 2 * bytes / dt. Chain-difference timing cancels the fixed
   dispatch+sync round trip (bench._timeit_stats).
2. Pallas DMA-only kernel: HBM -> VMEM -> HBM tile copy with no compute;
   the Mosaic DMA engine's own rate, immune to XLA fusion choices.
3. MXU canary (bench._canary_tfs) for cross-reference that the chip is
   quiet while the numbers are taken.

If both 1 and 2 plateau at the same value across sizes >= 64 MB, that is
the chip's real effective ceiling as seen by programs (tunnel only adds
fixed latency, which the chain difference removes). If they diverge, or
scale with size in a latency-shaped way, the 240 is an artifact.

Writes rooflines-ready JSON lines; run on a quiet chip.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _canary_tfs, _timeit_stats, wait_for_quiet_chip


def xla_copy_bw(n_bytes: int):
    n = n_bytes // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def add1(x):
        return x + 1.0

    best, med, _ = _timeit_stats(add1, x, iters=8, trials=3)
    return 2 * n_bytes / best / 1e9, 2 * n_bytes / med / 1e9


def pallas_copy_bw(n_bytes: int, tile: int = 512 * 1024):
    from jax.experimental import pallas as pl

    n = n_bytes // 4
    lanes = 128
    rows = n // lanes
    tile_rows = tile // 4 // lanes
    rows = rows // tile_rows * tile_rows
    x = jnp.zeros((rows, lanes), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    copy = pl.pallas_call(
        kernel,
        grid=(rows // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )
    fn = jax.jit(copy)
    nb = rows * lanes * 4
    best, med, _ = _timeit_stats(fn, x, iters=8, trials=3)
    return 2 * nb / best / 1e9, 2 * nb / med / 1e9


def main():
    canary = wait_for_quiet_chip()
    print(json.dumps({"canary_tfs": round(canary, 1)}), flush=True)
    for mb in [4, 16, 64, 256, 512]:
        nb = mb * 1024 * 1024
        xb, xm = xla_copy_bw(nb)
        pb, pm = pallas_copy_bw(nb)
        print(json.dumps({
            "size_mb": mb,
            "xla_copy_gbs": round(xb, 1), "xla_copy_med": round(xm, 1),
            "pallas_dma_gbs": round(pb, 1), "pallas_dma_med": round(pm, 1),
        }), flush=True)
    print(json.dumps({"canary_tfs_after": round(_canary_tfs(), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
