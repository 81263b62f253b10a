"""Probe Mosaic (Pallas TPU) capabilities that gate the mega2 kernel design.

Each probe compiles + runs a tiny kernel on the chip and reports OK/FAIL.
Findings feed docs/PERF.md's Mosaic portability notes.

Probes:
  1. while_loop whose cond is a scalar reduced from a vector (persistent loop)
  2. dynamic gather along the LANE dim (jnp.take / take_along_axis)
  3. dynamic gather along the SUBLANE dim
  4. dynamic sublane slice (pl.ds with traced start) feeding an MXU matmul
  5. f32 matmul [C,16]x[16,R] on the MXU inside a kernel
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


def probe_while_vector_cond():
    def kernel(x_ref, o_ref):
        def cond(c):
            v, n = c
            return jnp.sum((v < 10.0).astype(jnp.int32)) > 0

        def body(c):
            v, n = c
            return v + 1.0, n + 1

        v, n = jax.lax.while_loop(cond, body, (x_ref[:], jnp.int32(0)))
        o_ref[:] = v + n.astype(jnp.float32)

    x = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(5.0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_gather_lane():
    def kernel(t_ref, i_ref, o_ref):
        tbl = t_ref[:]            # [8, 256]
        idx = i_ref[:]            # [8, 128] int32 in [0, 256)
        o_ref[:] = jnp.take_along_axis(tbl[:, :128] * 0 + t_ref[:, :128], idx % 128, axis=1)

    t = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    i = jnp.full((8, 128), 7, jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)


def probe_gather_lane_full():
    """Gather arbitrary lanes of a [1,256] table with [1,128] indices."""
    def kernel(t_ref, i_ref, o_ref):
        tbl = t_ref[:]            # [1, 256]
        idx = i_ref[:]            # [1, 128]
        o_ref[:] = jnp.take(tbl, idx, axis=1)[0]

    t = jnp.arange(256, dtype=jnp.float32).reshape(1, 256)
    i = (jnp.arange(128, dtype=jnp.int32) * 2).reshape(1, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)


def probe_gather_sublane():
    def kernel(t_ref, i_ref, o_ref):
        tbl = t_ref[:]            # [256, 128]
        idx = i_ref[:]            # [8, 128]
        o_ref[:] = jnp.take_along_axis(tbl, idx, axis=0)[:8]

    t = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    i = jnp.full((8, 128), 3, jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)


def probe_dynamic_sublane_slice_dot():
    def kernel(t_ref, f_ref, o_ref):
        def body(c, acc):
            g = t_ref[pl.ds(c * 128, 128), :]        # [128, 16]
            acc = acc + jnp.dot(g, f_ref[:],
                                preferred_element_type=jnp.float32)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.zeros((128, 128), jnp.float32))

    t = jnp.ones((512, 16), jnp.float32)
    f = jnp.ones((16, 128), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, f)


def probe_f32_matmul():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    a = jnp.ones((128, 16), jnp.float32)
    b = jnp.ones((16, 256), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def probe_transposed_onehot_dot():
    """[NP,R] one-hot contracted on axis 0 against [NP,C] attrs -> [C,R]."""
    def kernel(w_ref, a_ref, o_ref):
        oh = (w_ref[:] == 3).astype(jnp.float32)     # [256, 128]
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [32, 128]

    w = jnp.full((256, 128), 3, jnp.int32)
    a = jnp.ones((256, 32), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, a)


def probe_gather_wide(width, rows=1):
    """take_along_axis from a [rows, width] table with [rows, 128] indices."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def go():
        t = jnp.arange(rows * width, dtype=jnp.float32).reshape(rows, width)
        i = (jnp.arange(128, dtype=jnp.int32) * (width // 128)).reshape(1, 128)
        i = jnp.tile(i, (rows, 1))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return go


def probe_gather_int32_wide(width):
    """Image-texture shape: int32 packed texels, [1, width] table."""
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    def go():
        t = jnp.arange(width, dtype=jnp.int32).reshape(1, width)
        i = (jnp.arange(128, dtype=jnp.int32) * (width // 128)).reshape(1, 128)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return go


def probe_gather_timing():
    """Cost of repeated [24,256]-table gathers (the Perlin access shape)."""
    import time

    REP = 200

    def kernel(t_ref, i_ref, o_ref):
        acc = jnp.zeros((24, 128), jnp.float32)

        def body(k, acc):
            idx = (i_ref[:] + k) & 255
            acc = acc + jnp.take_along_axis(t_ref[:], idx, axis=1)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, REP, body, acc)

    t = jnp.ones((24, 256), jnp.float32)
    i = jnp.zeros((24, 128), jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((24, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    f(t, i).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(t, i)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 50
    print(f"     gather [24,256]->[24,128] x{REP}: {dt*1e6/REP:.2f} us/gather "
          f"(incl ~0.6ms relay amortized over {REP})")
    return out


def probe_trig():
    """arccos / arctan2 lowering (sphere UV, Sphere.h:74-81)."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.arccos(jnp.clip(x, -1.0, 1.0)) + \
            jnp.arctan2(x, 1.0 - x)

    x = jnp.full((8, 128), 0.5, jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


if __name__ == "__main__":
    print(f"backend: {jax.devices()}")
    run("while_vector_cond", probe_while_vector_cond)
    run("trig arccos/atan2", probe_trig)
    run("gather_lane (take_along_axis ax1)", probe_gather_lane)
    run("gather_lane_mismatch [1,256]->[1,128]", probe_gather_wide(256))
    run("gather_sublane (take_along_axis ax0)", probe_gather_sublane)
    run("dyn_sublane_slice + dot", probe_dynamic_sublane_slice_dot)
    run("f32_matmul_16", probe_f32_matmul)
    run("transposed_onehot_dot", probe_transposed_onehot_dot)
    run("gather_wide_64k", probe_gather_wide(65536))
    run("gather_wide_512k_i32 (image)", probe_gather_int32_wide(524288))
    run("gather_rows24 [24,256] (perlin)", probe_gather_wide(256, rows=24))
    run("gather_timing", probe_gather_timing)
