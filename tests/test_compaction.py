"""Compacted-wavefront integrator must match the plain masked integrator
ray-for-ray under slot-keyed RNG, up to XLA fusion/fma rounding (<= 1 ulp;
the two programs fuse differently) — the exactness contract that makes the
compaction machinery (stable sort, tile conds, slot un-permutation) testable."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import (scene_2_spheres, scene_4_spheres,
                                      scene_diel_spheres_hollow,
                                      scene_random_spheres, t_cam1, t_default_cam,
                                      trace, trace_compacted)
from raytracingweekend_jl_tpu.camera import get_rays
from raytracingweekend_jl_tpu.render import pixel_coords, render_radiance

KEY = jax.random.PRNGKey(42)


def primary_rays(cam, W=64, H=36):
    u, v = pixel_coords(W, H)
    return get_rays(cam, u, v, jax.random.fold_in(KEY, 9))


def assert_compact_equals_keyed(scene, cam, tile, W=64, H=36, max_depth=16):
    o, d = primary_rays(cam, W, H)
    a = np.asarray(trace(scene, o, d, KEY, max_depth=max_depth, keyed=True))
    b = np.asarray(trace_compacted(scene, o, d, KEY, max_depth=max_depth,
                                   tile=tile))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_compact_bitexact_2_spheres():
    assert_compact_equals_keyed(scene_2_spheres(), t_default_cam(), tile=512)


def test_compact_bitexact_uneven_tile_padding():
    # 64*36 = 2304 rays, tile 1000 → padding rays must not contribute.
    assert_compact_equals_keyed(scene_4_spheres(), t_default_cam(), tile=1000)


def test_compact_bitexact_hollow_glass():
    # Long TIR chains exercise deep bounces + the while early-exit.
    assert_compact_equals_keyed(scene_diel_spheres_hollow(), t_default_cam(),
                                tile=256)


def test_compact_bitexact_random_spheres():
    assert_compact_equals_keyed(scene_random_spheres(seed=1), t_cam1(), tile=512,
                                W=48, H=27)


def test_compact_tile_size_invariance():
    scene = scene_4_spheres()
    o, d = primary_rays(t_default_cam())
    a = np.asarray(trace_compacted(scene, o, d, KEY, tile=128))
    b = np.asarray(trace_compacted(scene, o, d, KEY, tile=2304))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_compact_early_exit_all_sky():
    # Rays pointing straight up never hit: loop must exit after bounce 1 and
    # return exactly sky.
    from raytracingweekend_jl_tpu import make_scene, skycolor
    scene = make_scene([])
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (64, 1))
    o = jnp.zeros((64, 3), jnp.float32)
    rad = np.asarray(trace_compacted(scene, o, d, KEY))
    np.testing.assert_allclose(rad, np.asarray(skycolor(d)), atol=1e-6)


def test_render_compact_pipeline():
    # Full driver with compact=True: valid image, statistically equal to the
    # default path (different RNG stream class → not bitwise).
    scene = scene_2_spheres()
    a = np.asarray(render_radiance(scene, t_default_cam(), 64, 4, seed=3))
    b = np.asarray(render_radiance(scene, t_default_cam(), 64, 4, seed=3,
                                   compact=True))
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.01


def test_trace_occupancy_stats():
    from raytracingweekend_jl_tpu.ops.integrator import trace_occupancy
    scene = scene_4_spheres()
    o, d = primary_rays(t_default_cam())
    counts, tiles = trace_occupancy(scene, o, d, KEY, tile=256)
    counts, tiles = np.asarray(counts), np.asarray(tiles)
    assert counts[0] == o.shape[0]          # all rays alive at bounce 0
    assert (np.diff(counts) <= 0).all()     # monotone deaths
    assert tiles[0] == -(-o.shape[0] // 256)
    assert (tiles <= tiles[0]).all() and (tiles >= 0).all()


def test_persistent_matches_plain_statistically():
    from raytracingweekend_jl_tpu.render import render_radiance
    scene = scene_2_spheres()
    cam = t_default_cam()
    a = np.asarray(render_radiance(scene, cam, 64, 8, seed=4))
    b = np.asarray(render_radiance(scene, cam, 64, 8, seed=4, persistent=True))
    assert abs(a.mean() - b.mean()) < 0.01
    assert np.abs(a - b).mean() < 0.06
    assert np.isfinite(b).all()


def test_persistent_deterministic_paths_exact():
    # Fuzz-0 mirror scene at spp=1 (no randomness consumed in taken branches):
    # persistent must equal the classic driver bitwise.
    from raytracingweekend_jl_tpu.render import render_radiance
    from raytracingweekend_jl_tpu import make_scene, metal, default_camera
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    x = np.asarray(render_radiance(scene, cam, 32, 1, seed=1))
    y = np.asarray(render_radiance(scene, cam, 32, 1, seed=1, persistent=True))
    np.testing.assert_array_equal(x, y)


def test_persistent_depth_semantics():
    # max_depth=1: any hit is exhausted after one scatter -> black; sky misses
    # still accumulate. Compare against plain trace driver.
    from raytracingweekend_jl_tpu.render import render_radiance
    scene = scene_2_spheres()
    cam = t_default_cam()
    a = np.asarray(render_radiance(scene, cam, 48, 1, seed=0, max_depth=1))
    b = np.asarray(render_radiance(scene, cam, 48, 1, seed=0, max_depth=1,
                                   persistent=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_persistent_spp_scaling():
    # Radiance sum divided by spp must converge (variance shrinks with spp).
    from raytracingweekend_jl_tpu.render import render_radiance
    scene = scene_2_spheres()
    cam = t_default_cam()
    lo = np.asarray(render_radiance(scene, cam, 48, 2, seed=1, persistent=True))
    hi = np.asarray(render_radiance(scene, cam, 48, 32, seed=1, persistent=True))
    ref = np.asarray(render_radiance(scene, cam, 48, 32, seed=2, persistent=True))
    assert np.abs(hi - ref).mean() < np.abs(lo - ref).mean()
