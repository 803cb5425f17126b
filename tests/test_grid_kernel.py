"""Two-level cluster sweep prototype (ops/pallas/experimental/grid_kernel.py).

Contract: winner-IDENTICAL to the flat sweep (the cluster bound test is
conservative — a bounding sphere contains its members, so no true hit can
be culled); hit distances agree to f32 tolerance (the prototype's ck is
precomputed in f64, the flat sweep's in f32 — a rounding difference only).
"""

import jax
import jax.numpy as jnp
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu import rng as rngmod
from raytracingweekend_jl_tpu.camera import get_rays
from raytracingweekend_jl_tpu.ops.intersect import BIG
from raytracingweekend_jl_tpu.ops.pallas.experimental.grid_kernel import (
    build_grid, intersect_spheres_grid)
from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
    intersect_spheres_pallas)
from raytracingweekend_jl_tpu.render import pixel_coords
from raytracingweekend_jl_tpu.scene import trim_scene


def _rays(W=96, H=54, seed=3):
    cam = rtw.t_cam1()
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(seed)
    return get_rays(cam, u, v, rngmod.purpose_key(key, rngmod.LENS))


def test_grid_layout_partitions_scene():
    scene = trim_scene(rtw.ALL_SCENES["random_spheres"]())
    g = build_grid(scene)
    # Every original sphere appears exactly once in the index map's live
    # slots (dummy slots carry ck=1e30 and never hit).
    live = g["ck"] < 1e29
    assert np.sort(g["im"][live]).tolist() == list(range(scene.n_spheres))
    assert g["n_global"] + g["K"] * g["P"] == g["im"].shape[0]


def test_grid_sweep_matches_flat_sweep():
    scene = trim_scene(rtw.ALL_SCENES["random_spheres"]())
    g = build_grid(scene)
    o, d = _rays()
    flat = intersect_spheres_pallas(o, d, scene, interpret=True)
    res, skips = intersect_spheres_grid(o, d, scene, g, interpret=True)
    hit_f = np.asarray(flat.hit)
    hit_g = np.asarray(res.hit)
    np.testing.assert_array_equal(hit_f, hit_g)
    # Same winners everywhere a hit exists.
    np.testing.assert_array_equal(np.asarray(flat.index)[hit_f],
                                  np.asarray(res.index)[hit_f])
    np.testing.assert_allclose(np.asarray(flat.t)[hit_f],
                               np.asarray(res.t)[hit_f],
                               rtol=5e-5, atol=1e-5)
    # At this size some clusters must actually be culled (sanity that the
    # bound test fires at all).
    assert int(np.asarray(skips).sum()) > 0


def test_grid_sweep_small_scene_all_global():
    # Scenes whose spheres are all "global" (big/degenerate) degenerate to
    # a flat sweep over the global list with zero clusters of substance.
    scene = trim_scene(rtw.ALL_SCENES["2_spheres"]())
    o, d = _rays(W=32, H=18)
    g = build_grid(scene) if (np.abs(np.asarray(scene.radius)) < 1).any() \
        else None
    flat = intersect_spheres_pallas(o, d, scene, interpret=True)
    res, _ = intersect_spheres_grid(o, d, scene, g, interpret=True)
    np.testing.assert_array_equal(np.asarray(flat.hit), np.asarray(res.hit))
    hit = np.asarray(flat.hit)
    np.testing.assert_allclose(np.asarray(flat.t)[hit],
                               np.asarray(res.t)[hit], rtol=5e-5, atol=1e-5)
