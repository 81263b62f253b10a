"""On-chip cost attribution for the mega2 DENSE sphere pair test.

Round-4's MEGA2_NOSHADE probe proved the persistent kernel is pair-test
bound (~512 padded prims x ~36 flops/segment at ~117 Gpair/s, ~9% of the
VPU's measured 10.5 Tops/s elementwise ceiling).  This probe isolates the
pair section itself — the [C,16]x[16,R] MXU coefficient dots plus the VPU
quadratic/select/reduce chain of `mega2.sph_dense` — and times ablation
variants to attribute the gap before optimizing (VERDICT round-4 ask #1).

Each probe iteration runs SUB=8 INDEPENDENT sub-row chains (matching the
kernel's instruction-level parallelism); the ray features are perturbed by
the loop index (anti-hoist) and results fold into a carried accumulator
(anti-DCE).  Cost is reported in ns per (prim, ray) pair.

NOTE (round 5): the dots-based variants profile the PRE-FIX kernel —
the MXU coefficient expansion was removed after its default-precision
input rounding was shown to distort the pair test (docs/PERF.md round 5,
"part 2").  The production kernel is the `direct` variant (exact VPU
quadratic, ~86 Gpair/s wall); the dot variants remain as the record of
why 125 Gpair/s was never a correct operating point.

Usage: python tools/probe_pair.py [C] [REP] [SUB] [variant,variant]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128
C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 500
SUB = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ONLY = sys.argv[4].split(",") if len(sys.argv) > 4 else None
BIG = 1.0e30


def make_probe(variant: str):
    """Build a jitted pallas probe for one ablation variant."""

    def kernel(coef_ref, ray_ref, o_ref):
        def subrow(s, it):
            rr = lambda k: ray_ref[k * SUB + s:k * SUB + s + 1, :]
            tweak = it.astype(jnp.float32) * np.float32(1e-20)
            akey = rr(10)
            dx, dy, dz = rr(0) + tweak, rr(1), rr(2)
            opx, opy, opz = rr(3), rr(4), rr(5)
            tmv = rr(6)
            a = rr(7)
            od = opx * dx + opy * dy + opz * dz
            oo = opx * opx + opy * opy + opz * opz
            one = jnp.ones_like(dx)
            feat = jnp.concatenate([
                dx, dy, dz, tmv * dx, tmv * dy, tmv * dz,
                opx, opy, opz, tmv * opx, tmv * opy, tmv * opz,
                one, tmv, tmv * tmv, jnp.zeros_like(dx)], axis=0)

            if variant == "nodots":
                bmat = coef_ref[0:C, 0:1] + od
                cmat = coef_ref[C:2 * C, 0:1] + oo
            elif variant == "fuseddot":
                both = lax.dot_general(
                    coef_ref[...], feat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bmat = both[0:C, :] + od
                cmat = both[C:2 * C, :] + oo
            elif variant == "bf16dot":
                cb = coef_ref[0:C, :].astype(jnp.bfloat16)
                cc = coef_ref[C:2 * C, :].astype(jnp.bfloat16)
                fb = feat.astype(jnp.bfloat16)
                bmat = lax.dot_general(
                    cb, fb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + od
                cmat = lax.dot_general(
                    cc, fb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + oo
            elif variant == "k8dot":
                # static scenes (has_moving=False): b, c need only
                # [d(3), o'(3), 1, 0] — half the contraction
                feat8 = jnp.concatenate(
                    [dx, dy, dz, opx, opy, opz, one,
                     jnp.zeros_like(dx)], axis=0)
                bmat = lax.dot_general(
                    coef_ref[0:C, 0:8], feat8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + od
                cmat = lax.dot_general(
                    coef_ref[C:2 * C, 0:8], feat8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + oo
            else:
                bmat = lax.dot_general(
                    coef_ref[0:C, :], feat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + od
                cmat = lax.dot_general(
                    coef_ref[C:2 * C, :], feat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + oo

            if variant == "dotsonly":
                return bmat[0:1, :] + cmat[0:1, :]

            disc = bmat * bmat - a * cmat
            if variant == "nosqrt":
                sq = disc * np.float32(0.5)
            else:
                sq = jnp.sqrt(disc)
            k1 = -bmat - sq
            k2 = -bmat + sq
            if variant == "noselect":
                key = k1 + k2
            else:
                key = jnp.where(k1 > akey, k1, k2)
                ok = (disc > 0.0) & (key > akey)
                key = jnp.where(ok, key, BIG)
            if variant == "noreduce":
                return key[0:1, :]
            if variant == "treereduce":
                # joint (key, idx) binary tree: ties take the LEFT half,
                # which is exactly the first-index-of-min semantics
                idx = lax.broadcasted_iota(jnp.int32, key.shape, 0)
                n = key.shape[0]
                while n > 8:
                    h = n // 2
                    kl, kr = key[0:h, :], key[h:n, :]
                    il, ir = idx[0:h, :], idx[h:n, :]
                    takel = kl <= kr
                    key = jnp.where(takel, kl, kr)
                    idx = jnp.where(takel, il, ir)
                    n = h
                mn = jnp.min(key, axis=0, keepdims=True)
                fin = jnp.min(jnp.where(key == mn, idx, C),
                              axis=0, keepdims=True)
                return mn + fin.astype(jnp.float32) * np.float32(1e-9)
            mn = jnp.min(key, axis=0, keepdims=True)
            if variant == "noidx":
                return mn
            iota_c = lax.broadcasted_iota(jnp.int32, key.shape, 0)
            idx = jnp.min(jnp.where(key == mn, iota_c, C),
                          axis=0, keepdims=True)
            return mn + idx.astype(jnp.float32) * np.float32(1e-9)

        def vpu_chain(bmat, cmat, a, akey, tree: bool):
            disc = bmat * bmat - a * cmat
            sq = jnp.sqrt(disc)
            k1 = -bmat - sq
            k2 = -bmat + sq
            key = jnp.where(k1 > akey, k1, k2)
            ok = (disc > 0.0) & (key > akey)
            key = jnp.where(ok, key, BIG)
            if tree:
                idx = lax.broadcasted_iota(jnp.int32, key.shape, 0)
                n = key.shape[0]
                while n > 8:
                    h = n // 2
                    takel = key[0:h, :] <= key[h:n, :]
                    key = jnp.where(takel, key[0:h, :], key[h:n, :])
                    idx = jnp.where(takel, idx[0:h, :], idx[h:n, :])
                    n = h
                mn = jnp.min(key, axis=0, keepdims=True)
                fin = jnp.min(jnp.where(key == mn, idx, C),
                              axis=0, keepdims=True)
            else:
                mn = jnp.min(key, axis=0, keepdims=True)
                iota_c = lax.broadcasted_iota(jnp.int32, key.shape, 0)
                fin = jnp.min(jnp.where(key == mn, iota_c, C),
                              axis=0, keepdims=True)
            return mn + fin.astype(jnp.float32) * np.float32(1e-9)

        def subrow_dots(s, it):
            rr = lambda k: ray_ref[k * SUB + s:k * SUB + s + 1, :]
            tweak = it.astype(jnp.float32) * np.float32(1e-20)
            dx, dy, dz = rr(0) + tweak, rr(1), rr(2)
            opx, opy, opz = rr(3), rr(4), rr(5)
            tmv = rr(6)
            od = opx * dx + opy * dy + opz * dz
            oo = opx * opx + opy * opy + opz * opz
            one = jnp.ones_like(dx)
            feat = jnp.concatenate([
                dx, dy, dz, tmv * dx, tmv * dy, tmv * dz,
                opx, opy, opz, tmv * opx, tmv * opy, tmv * opz,
                one, tmv, tmv * tmv, jnp.zeros_like(dx)], axis=0)
            bmat = lax.dot_general(
                coef_ref[0:C, :], feat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + od
            cmat = lax.dot_general(
                coef_ref[C:2 * C, :], feat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + oo
            return bmat, cmat, rr(7), rr(10)

        def wide_feat(it, group):
            """[16, 128*len(group)] feature block: per-feature lane-concat
            of the group's sub-rows (128-aligned lane placement, no
            sublane rolls — unlike the round-2 state-wide variant)."""
            rr = lambda k, s: ray_ref[k * SUB + s:k * SUB + s + 1, :]
            tweak = it.astype(jnp.float32) * np.float32(1e-20)
            rows = []
            per = {}
            for s in group:
                dx, dy, dz = rr(0, s) + tweak, rr(1, s), rr(2, s)
                opx, opy, opz = rr(3, s), rr(4, s), rr(5, s)
                tmv = rr(6, s)
                od = opx * dx + opy * dy + opz * dz
                oo = opx * opx + opy * opy + opz * opz
                per[s] = (od, oo, rr(7, s), rr(10, s))
                one = jnp.ones_like(dx)
                rows.append([dx, dy, dz, tmv * dx, tmv * dy, tmv * dz,
                             opx, opy, opz, tmv * opx, tmv * opy, tmv * opz,
                             one, tmv, tmv * tmv, jnp.zeros_like(dx)])
            feat = jnp.concatenate(
                [jnp.concatenate([rows[g][k] for g in range(len(group))],
                                 axis=1) for k in range(16)], axis=0)
            return feat, per

        def wide_body(it, gsize, dots_only=False):
            rows_out = {}
            for g0 in range(0, SUB, gsize):
                group = list(range(g0, g0 + gsize))
                feat, per = wide_feat(it, group)
                bw = lax.dot_general(
                    coef_ref[0:C, :], feat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cw = lax.dot_general(
                    coef_ref[C:2 * C, :], feat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for j, s in enumerate(group):
                    od, oo, a, ak = per[s]
                    bs = bw[:, j * R:(j + 1) * R] + od
                    cs = cw[:, j * R:(j + 1) * R] + oo
                    if dots_only:
                        rows_out[s] = bs[0:1, :] + cs[0:1, :]
                    else:
                        rows_out[s] = vpu_chain(bs, cs, a, ak, True)
            return [rows_out[s] for s in range(SUB)]

        def subrow_direct(s, it):
            """Exact VPU quadratic: no MXU coefficient expansion, centers
            broadcast one axis at a time (Mosaic has no dual-axis
            broadcast; [C,1]+[1,R] forms lower badly)."""
            rr = lambda k: ray_ref[k * SUB + s:k * SUB + s + 1, :]
            tweak = it.astype(jnp.float32) * np.float32(1e-20)
            akey = rr(10)
            dx, dy, dz = rr(0) + tweak, rr(1), rr(2)
            ox, oy, oz = rr(3), rr(4), rr(5)
            a = rr(7)
            cxc = jnp.broadcast_to(coef_ref[0:C, 0:1], (C, R))
            cyc = jnp.broadcast_to(coef_ref[0:C, 1:2], (C, R))
            czc = jnp.broadcast_to(coef_ref[0:C, 2:3], (C, R))
            rad = jnp.broadcast_to(coef_ref[0:C, 3:4], (C, R))
            ocx = ox - cxc
            ocy = oy - cyc
            ocz = oz - czc
            b = ocx * dx + ocy * dy + ocz * dz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = b * b - a * cc
            return vpu_chain_from(b, disc, a, akey)

        def vpu_chain_from(bmat, disc, a, akey):
            sq = jnp.sqrt(disc)
            k1 = -bmat - sq
            k2 = -bmat + sq
            key = jnp.where(k1 > akey, k1, k2)
            ok = (disc > 0.0) & (key > akey)
            key = jnp.where(ok, key, BIG)
            idx = lax.broadcasted_iota(jnp.int32, key.shape, 0)
            n = key.shape[0]
            while n > 8:
                h = n // 2
                takel = key[0:h, :] <= key[h:n, :]
                key = jnp.where(takel, key[0:h, :], key[h:n, :])
                idx = jnp.where(takel, idx[0:h, :], idx[h:n, :])
                n = h
            mn = jnp.min(key, axis=0, keepdims=True)
            fin = jnp.min(jnp.where(key == mn, idx, C),
                          axis=0, keepdims=True)
            return mn + fin.astype(jnp.float32) * np.float32(1e-9)

        def body(it, carry):
            if variant == "direct":
                rows = [subrow_direct(s, it) for s in range(SUB)]
            elif variant == "wide2_tree":
                rows = wide_body(it, 2)
            elif variant == "wide4_tree":
                rows = wide_body(it, 4)
            elif variant == "wide8_tree":
                rows = wide_body(it, 8)
            elif variant == "wide8_dotsonly":
                rows = wide_body(it, 8, dots_only=True)
            elif variant in ("dotsfirst", "df_tree"):
                # issue every sub-row's MXU dots before any VPU chain:
                # the VPU work on sub-row s then overlaps the in-flight
                # dots of sub-rows s+1.. instead of serializing
                dots = [subrow_dots(s, it) for s in range(SUB)]
                rows = [vpu_chain(b, c, a, ak, variant == "df_tree")
                        for (b, c, a, ak) in dots]
            else:
                rows = [subrow(s, it) for s in range(SUB)]
            return carry + jnp.concatenate(rows, axis=0)

        acc = lax.fori_loop(0, REP, body, jnp.zeros((SUB, R), jnp.float32))
        o_ref[:] = acc

    coef = jnp.asarray(
        np.random.default_rng(0).standard_normal((2 * C, 16)), jnp.float32)
    ray = jnp.asarray(
        np.random.default_rng(1).standard_normal((11 * SUB, R)), jnp.float32)
    ray = ray.at[7 * SUB:8 * SUB].set(
        jnp.abs(ray[7 * SUB:8 * SUB]) + 1.0)            # a > 0
    ray = ray.at[10 * SUB:11 * SUB].set(
        0.001 * ray[7 * SUB:8 * SUB])                   # akey = t_min * a

    fn = jax.jit(lambda c, r: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(c, r))
    return fn, coef, ray


VARIANTS = ["full", "fuseddot", "bf16dot", "nodots", "nosqrt", "noselect",
            "noidx", "noreduce", "dotsonly", "treereduce", "k8dot",
            "dotsfirst", "df_tree", "wide2_tree", "wide4_tree",
            "wide8_tree", "wide8_dotsonly", "direct"]


def main():
    print(f"backend: {jax.devices()}  C={C} REP={REP} SUB={SUB}")
    pairs = REP * C * R * SUB
    results = {}
    for v in (ONLY or VARIANTS):
        fn, coef, ray = make_probe(v)
        fn(coef, ray).block_until_ready()               # compile
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(coef, ray)
            np.asarray(out)                              # force completion
            best = min(best, time.perf_counter() - t0)
        ns = best * 1e9 / pairs
        results[v] = ns
        print(f"{v:10s}: {best*1e3:8.2f} ms  {ns:6.4f} ns/pair "
              f"({pairs/best/1e9:6.1f} Gpair/s)")
    base = results.get("full")
    if base:
        print("\nattribution vs full:")
        for v in VARIANTS[1:]:
            print(f"  {v:10s}: {base - results[v]:+7.4f} ns/pair "
                  f"({100*(base-results[v])/base:+5.1f}%)")


if __name__ == "__main__":
    main()
