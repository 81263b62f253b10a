"""Probe: relative cost of u32/i32 multiply vs add/xor/shift vs f32 mul
inside a Pallas TPU kernel (is pcg4d's 12-multiply core the bottleneck?).

One kernel call, ITERS fori_loop iterations of an 8-op chain on [8,128],
per op flavor; ratios are meaningful even if absolutes are relay-skewed.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 5_000_000

def make(flavor):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if flavor in ("u32mul", "u32mix", "u32addxor", "i32mul"):
            x = pltpu.bitcast(x, jnp.uint32 if flavor.startswith("u32") else jnp.int32)
        def body(i, x):
            if flavor == "f32mul":
                for _ in range(8):
                    x = x * np.float32(1.000001) + np.float32(1e-9)
            elif flavor == "u32mul":
                M = jnp.uint32(1664525)
                for _ in range(8):
                    x = x * M + jnp.uint32(1)
            elif flavor == "i32mul":
                M = jnp.int32(1664525)
                for _ in range(8):
                    x = x * M + jnp.int32(1)
            elif flavor == "u32addxor":
                for _ in range(8):
                    x = (x + jnp.uint32(0x9E3779B9)) ^ (x >> 16)
            elif flavor == "u32mix":    # one pcg4d-ish mult + xorshift
                M = jnp.uint32(1664525)
                for _ in range(4):
                    x = x * M + jnp.uint32(1013904223)
                    x = x ^ (x >> 16)
            return x
        x = lax.fori_loop(0, ITERS, body, x)
        if flavor != "f32mul":
            x = pltpu.bitcast(x, jnp.float32)
        o_ref[...] = x
    return kernel

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) + 1.5
for flavor in ("f32mul", "i32mul", "u32mul", "u32addxor", "u32mix"):
    fn = pl.pallas_call(
        make(flavor),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    r = jax.jit(fn)(x); r.block_until_ready()
    t0 = time.perf_counter(); r = jax.jit(fn)(x); r.block_until_ready()
    dt = time.perf_counter() - t0
    per_op = dt / (ITERS * 8) * 1e9
    print(f"{flavor:10s}: {dt*1e3:8.2f} ms  ~{per_op:6.2f} ns/[8x128]-op")
