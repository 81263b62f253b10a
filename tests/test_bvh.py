"""BVH: builder invariants + the reference's BVH-equivalence test.

The reference validated its BVH by MD5-hashing the output PPM with and
without BVH and requiring byte-identical images
(`Docs/2권_3장_BVH_CUDA적용판.md:733`) — possible there because both paths
ran the *same* per-primitive code.  Here the brute-force engine evaluates
hits via [B,3]x[3,N] contractions while the BVH engine evaluates one
gathered primitive per step, so floating-point rounding differs at the ulp
level; the contract is: identical RNG streams, near-identical images
(everywhere but isolated grazing-incidence pixels), and *exactly* identical
winner sets wherever the two engines' candidate t's are not within an ulp.
In f64 the images agree to ~1e-12 except at most a pixel or two per frame.
"""

import numpy as np
import pytest

from raytracinginoneweekendincuda_tpu.models import scenes
from raytracinginoneweekendincuda_tpu.ops.render import render
from raytracinginoneweekendincuda_tpu.scene.bvh import (
    build_bvh, build_scene_bvh, primitive_bounds,
)
from raytracinginoneweekendincuda_tpu.scene.compiler import compile_scene
from raytracinginoneweekendincuda_tpu.utils.config import RenderConfig


def _leaf_reachability(bvh):
    """Walk the threaded layout sequentially; collect visited leaves."""
    m = len(bvh.prim)
    leaves = []
    node = 0
    visited = 0
    while node < m:
        visited += 1
        assert visited <= 4 * m, "traversal does not terminate"
        if bvh.prim[node] >= 0:
            leaves.append(int(bvh.prim[node]))
            node = int(bvh.escape[node])
        else:
            node = node + 1      # descend (as if every AABB hit)
    return leaves


@pytest.mark.parametrize("scene_id", [0, 4, 7, 9])
def test_builder_invariants(scene_id):
    scene, meta = compile_scene(scenes.build_scene(scene_id), 8, 8)
    lo, hi, ids = primitive_bounds(scene)
    bvh = build_scene_bvh(scene)
    n = len(ids)
    m = len(bvh.prim)
    assert m == 2 * n - 1                      # binary tree over n leaves
    # every primitive appears exactly once as a leaf, reachable by threading
    leaves = _leaf_reachability(bvh)
    assert sorted(leaves) == sorted(ids.tolist())
    # parent boxes contain children (walk: internal node i's first child is
    # i+1; its sibling is escape[i+1])
    eps = 1e-6
    for i in range(m):
        if bvh.prim[i] < 0:
            left = i + 1
            right = int(bvh.escape[left])
            for c in (left, right):
                assert (bvh.nmin[i] <= bvh.nmin[c] + eps).all()
                assert (bvh.nmax[i] >= bvh.nmax[c] - eps).all()
    # escape targets are strictly forward, within [0, m]
    assert ((bvh.escape > np.arange(m)) & (bvh.escape <= m)).all()


def test_single_primitive():
    scene, meta = compile_scene(scenes.book1_basic(), 8, 8)
    lo, hi, ids = primitive_bounds(scene)
    bvh = build_bvh(lo[:1], hi[:1], ids[:1])
    assert len(bvh.prim) == 1 and bvh.prim[0] == ids[0] and bvh.escape[0] == 1


@pytest.mark.parametrize("scene_id,spp", [(0, 2), (4, 2), (7, 2), (9, 1)])
def test_bvh_image_equivalence(scene_id, spp):
    """engine='bvh' vs engine='bruteforce', f64: same RNG, same winners."""
    W, H = 32, 18
    desc = scenes.build_scene(scene_id)
    scene, meta = compile_scene(desc, W, H, dtype=np.float64)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       dtype="float64")
    img_bf = render(scene, meta, cfg.with_(engine="bruteforce"))
    img_bvh = render(scene, meta, cfg.with_(engine="bvh"))
    diff = np.abs(img_bf - img_bvh).max(axis=-1)
    mismatched = int((diff > 1e-9).sum())
    assert mismatched <= 2, (
        f"scene {scene_id}: {mismatched} pixels differ, max {diff.max():.3e}"
    )
