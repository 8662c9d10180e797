"""Isolate the wide-beam kernel's per-grid-step structural overhead.

The full kernel floor (empty body) measured ~279 us/step at W=104, B=128,
T=750 — far above any compute estimate. This probe rebuilds the
pallas_call SHELL (same grid, specs, scratch) with toggles to find which
piece charges it: the revisited fin output block, the per-step bp output
stream, the input streams, or the scratch count.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, V1, K, W, B = 750, 91, 8, 104, 128
N_FIN = 12


def build(with_fin=True, with_bp=True, with_inputs=True, n_scratch=19,
          fin_every_step=True):
    def kern(*refs):
        i = 0
        lens_ref = refs[i]; i += 1
        if with_inputs:
            lp_ref, toplp_ref, topci_ref = refs[i:i + 3]
            i += 3
        outs = []
        if with_bp:
            bp_ref = refs[i]; i += 1
        if with_fin:
            fin_ref = refs[i]; i += 1
        scr = refs[i:]
        t = pl.program_id(0)
        x = lens_ref[0].astype(jnp.float32)
        if with_inputs:
            x = x + jnp.sum(lp_ref[0], axis=0)
        if with_bp:
            bp_ref[0, 0] = jnp.zeros((W, B), jnp.int32)
            bp_ref[0, 1] = jnp.zeros((W, B), jnp.int32)
        if with_fin:
            if fin_every_step:
                fin_ref[0] = scr[0][...] + jnp.uint32(1)
            else:
                @pl.when(t == T - 1)
                def _():
                    fin_ref[0] = scr[0][...] + jnp.uint32(1)
        if scr:
            scr[0][...] = scr[0][...] + 1

    in_specs = [pl.BlockSpec((1, B), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)]
    args = [jnp.ones((1, B), jnp.int32)]
    if with_inputs:
        in_specs += [
            pl.BlockSpec((1, V1, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)]
        args += [jnp.ones((T, V1, B), jnp.float32),
                 jnp.ones((T, K, B), jnp.float32),
                 jnp.ones((T, K, B), jnp.int32)]
    out_specs, out_shape = [], []
    if with_bp:
        out_specs.append(pl.BlockSpec((1, 2, W, B), lambda t: (t, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, 2, W, B), jnp.int32))
    if with_fin:
        out_specs.append(pl.BlockSpec((N_FIN, W, B), lambda t: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N_FIN, W, B), jnp.uint32))
    fn = pl.pallas_call(
        kern, grid=(T,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((W, B), jnp.uint32)] * n_scratch)
    run = jax.jit(lambda *a: [o.reshape(-1)[0] for o in fn(*a)])
    return lambda: run(*args)


def timeit(f):
    jax.device_get(f())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        jax.device_get(out)
        best = min(best, time.perf_counter() - t0)
    return best / T * 1e6


cases = {
    "full": dict(),
    "fin_last_only": dict(fin_every_step=False),
    "no_fin": dict(with_fin=False),
    "no_bp": dict(with_bp=False),
    "no_inputs": dict(with_inputs=False),
    "bp_only": dict(with_inputs=False, with_fin=False),
    "inputs_only": dict(with_fin=False, with_bp=False),
}
name = sys.argv[1] if len(sys.argv) > 1 else "full"
try:
    us = timeit(build(**cases[name]))
    print(json.dumps({"case": name, "us_per_step": round(us, 2)}),
          flush=True)
except Exception as e:
    print(json.dumps({"case": name,
                      "fail": str(e).split(chr(10))[0][:150]}),
          flush=True)
