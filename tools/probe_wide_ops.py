"""Probe Mosaic primitives for the wide-beam kernel redesign (round 3).

Questions, answered empirically on the real chip:
 1. lane-axis take_along_axis on (8,128) vregs: compiles? cost? And the
    sliced (128,128) form (16 x (8,128) static slices)?
 2. last-two-dims transpose (104,128)<->(128,104) in-kernel: cost?
 3. (B, Wj, 1) x (B, 1, Wi) lane/sublane broadcast compare: cost?
 4. calibration: the (8, W, B) one-hot where+sum block the current
    kernel uses for parent select.
Each kernel loops its op `reps` times so per-op cost >> launch overhead.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, make_fn, per_op: int = 1):
    try:
        f = make_fn()
        out = jax.device_get(f())                 # compile + sync
        t0 = time.perf_counter()
        for _ in range(50):
            out = f()
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / 50 / per_op
        print(f"OK   {name}: {dt*1e6:.2f} us/op")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


REPS = 100


def gather_8x128():
    tab = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 104,
                             jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        t = t_ref[...]
        i = i_ref[...]
        acc = jnp.zeros((8, 128), jnp.float32)
        for g in range(REPS):
            acc = acc + jnp.take_along_axis(t, (i + g) % 104, axis=1)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(tab, idx)


def gather_128x128_sliced():
    tab = jax.random.normal(jax.random.PRNGKey(0), (128, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (128, 128), 0, 104,
                             jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        t = t_ref[...]
        i = i_ref[...]
        reps = REPS // 16
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(reps):
            parts = []
            for b0 in range(0, 128, 8):
                parts.append(jnp.take_along_axis(
                    t[b0:b0 + 8], (i[b0:b0 + 8] + g) % 104, axis=1))
            acc = acc + jnp.concatenate(parts, axis=0)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(tab, idx)


def gather_128x128_whole():
    tab = jax.random.normal(jax.random.PRNGKey(0), (128, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (128, 128), 0, 104,
                             jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        t = t_ref[...]
        i = i_ref[...]
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(REPS // 16):
            acc = acc + jnp.take_along_axis(t, (i + g) % 104, axis=1)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(tab, idx)


def transpose_104_128():
    x = jax.random.normal(jax.random.PRNGKey(0), (104, 128))

    def kern(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros((128, 104), jnp.float32)
        for g in range(REPS):
            acc = acc + jnp.transpose(x + g, (1, 0))
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 104), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(x)


def bcast_compare_BWW():
    xj = jax.random.randint(jax.random.PRNGKey(0), (128, 104), 0, 1 << 30,
                            jnp.int32)
    yi = jax.random.randint(jax.random.PRNGKey(1), (128, 104), 0, 1 << 30,
                            jnp.int32)

    def kern(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]
        acc = jnp.zeros((128, 104), jnp.int32)
        for g in range(REPS // 10):
            hit = (x[:, :, None] + g) == y[:, None, :]     # (B, Wj, Wi)
            acc = acc + jnp.sum(hit.astype(jnp.int32), axis=2)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 104), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(xj, yi)


def onehot_select_block():
    """Current kernel's psel block: (8, W, B) where+sum, W=104 B=128."""
    sel = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, 104,
                             jnp.int32)
    f = jax.random.normal(jax.random.PRNGKey(1), (104, 128))

    def kern(s_ref, f_ref, o_ref):
        s = s_ref[...]
        fv = f_ref[...]
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, 104, 128), 1)
        acc = jnp.zeros((8, 128), jnp.float32)
        for g in range(REPS // 10):
            pblk = ((s[:, None, :] + g) % 104) == iota_p
            acc = acc + jnp.sum(jnp.where(pblk, fv[None], 0.0), axis=1)
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(sel, f)


def lane_cumsum():
    """Hillis-Steele exclusive cumsum along 104 lanes via pltpu.roll."""
    x = jax.random.randint(jax.random.PRNGKey(0), (128, 128), 0, 2,
                           jnp.int32)

    def kern(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros((128, 128), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        for g in range(REPS // 10):
            c = x + g
            s = 1
            while s < 128:
                c = c + jnp.where(lane >= s, pltpu.roll(c, s, axis=1), 0)
                s *= 2
            acc = acc + c
        o_ref[...] = acc

    fn = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return lambda: fn(x)


if __name__ == "__main__":
    run("gather (8,128) lane", gather_8x128, per_op=REPS)
    run("gather (128,128) sliced 16x(8,128)", gather_128x128_sliced,
        per_op=REPS // 16)
    run("gather (128,128) whole", gather_128x128_whole, per_op=REPS // 16)
    run("transpose (104,128)->(128,104)", transpose_104_128, per_op=REPS)
    run("bcast cmp (B,Wj,1)x(B,1,Wi) + reduce", bcast_compare_BWW,
        per_op=REPS // 10)
    run("onehot select block (8,W,B)", onehot_select_block,
        per_op=REPS // 10)
    run("lane cumsum 128 (roll)", lane_cumsum, per_op=REPS // 10)
