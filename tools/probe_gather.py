"""Probe: Mosaic dynamic_gather forms (idx.shape == table.shape, 2D).

Measures the lane-axis gather (table (S, N), idx (S, N)) at several N to
confirm cost scaling — this is the primitive behind the large-word-LM
hash-probe beam kernel (ops/pallas_beam.py probe mode).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, make_fn):
    try:
        f = make_fn()
        out = jax.block_until_ready(f())
        t0 = time.perf_counter()
        for _ in range(100):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 100
        print(f"OK   {name}: {dt*1e6:.1f} us, sum={np.asarray(out).sum():.1f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def lane_gather(s, n):
    tab = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (1, n)), (s, n))
    idx = jax.random.randint(jax.random.PRNGKey(1), (s, n), 0, n, jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, i = jax.device_put(tab), jax.device_put(idx)
    return lambda: fn(t, i)


def sublane_gather(n, b):
    tab = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (n, 1)), (n, b))
    idx = jax.random.randint(jax.random.PRNGKey(1), (n, b), 0, n, jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, b), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, i = jax.device_put(tab), jax.device_put(idx)
    return lambda: fn(t, i)


# simulated probe-LM step: 12*P lane-gathers of (8, N) inside ONE kernel
def probe_step(n, n_gathers):
    tab = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (1, n)), (8, n))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, n), 0, n, jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        t = t_ref[...]
        i = i_ref[...]
        acc = jnp.zeros((8, n), jnp.float32)
        for g in range(n_gathers):
            acc = acc + jnp.take_along_axis(t, (i + g) % n, axis=1)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t, i = jax.device_put(tab), jax.device_put(idx)
    return lambda: fn(t, i)


for n in (1024, 8192, 32768, 131072):
    run(f"lane (8,{n})", lambda n=n: lane_gather(8, n))
run("lane (16,8192)", lambda: lane_gather(16, 8192))
run("sublane (8192,128)", lambda: sublane_gather(8192, 128))
for n, g in ((8192, 48), (32768, 48)):
    run(f"probe_step N={n} g={g}", lambda n=n, g=g: probe_step(n, g))
