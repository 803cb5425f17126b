"""Single-dispatch inline render kernel (interpret mode) — the small-config
latency path (VERDICT r2 Missing #1). Semantics must match the XLA wavefront:
exact on RNG-free paths, statistical otherwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingweekend_jl_tpu import (make_scene, metal, lambertian, dielectric,
                                      default_camera, scene_2_spheres,
                                      scene_4_spheres, t_default_cam)
from raytracingweekend_jl_tpu.ops.integrator import persistent_render_sum
from raytracingweekend_jl_tpu.ops.pallas import inline_kernel
from raytracingweekend_jl_tpu.ops.pallas.inline_kernel import (render_inline_sum,
                                                               trace_inline)
from raytracingweekend_jl_tpu.render import pixel_coords

KEY = jax.random.PRNGKey(3)


def run_both(scene, cam, W=48, H=27, spp=4, max_depth=16):
    u, v = pixel_coords(W, H)
    fw, fh = float(np.float32(W)), float(np.float32(H))
    a = persistent_render_sum(scene, cam, u, v, KEY, spp, 0, max_depth, 1e-4,
                              fw, fh)
    b = render_inline_sum(scene, cam, u, v, KEY, spp, 0, max_depth, 1e-4,
                          fw, fh, interpret=True)
    return np.asarray(a), np.asarray(b)


def test_inline_sky_only_exact():
    a, b = run_both(make_scene([]), t_default_cam(), spp=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_inline_mirror_exact():
    # fuzz-0 metal + aperture 0 + spp 1: no RNG affects the path.
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    a, b = run_both(scene, cam, spp=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_inline_diffuse_statistical():
    a, b = run_both(scene_2_spheres(), t_default_cam(), spp=16)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.01 * 16
    assert np.abs(a - b).mean() / 16 < 0.06


def test_inline_all_materials_statistical():
    a, b = run_both(scene_4_spheres(), t_default_cam(), spp=16)
    assert abs(a.mean() - b.mean()) < 0.01 * 16


def test_inline_glass_energy():
    scene = make_scene([
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        dielectric((0, 0, -1), 0.5, 1.5),
        dielectric((-1, 0, -1), -0.45, 1.5),
    ])
    a, b = run_both(scene, t_default_cam(), spp=8)
    assert np.isfinite(b).all()
    assert (b >= 0).all() and (b / 8 <= 1.0 + 1e-4).all()
    assert abs(a.mean() - b.mean()) / 8 < 0.02


def test_inline_depth_semantics():
    # max_depth=1: hits die black after one scatter; misses bank sky.
    a, b = run_both(scene_2_spheres(), t_default_cam(), spp=1, max_depth=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_inline_trace_matches_xla_trace_deterministic():
    # Direct kernel-vs-trace on arbitrary rays through an RNG-free scene.
    from raytracingweekend_jl_tpu.ops.integrator import trace
    scene = make_scene([
        metal((0, 0, -2), 0.7, (0.9, 0.5, 0.3), 0.0),
        metal((0, -100.7, 0), 100.0, (0.6, 0.6, 0.9), 0.0),
    ])
    k = jax.random.PRNGKey(9)
    R = 300
    org = jax.random.normal(k, (R, 3)) * 0.1
    d = jax.random.normal(jax.random.fold_in(k, 1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = np.asarray(trace(scene, org, d, k, max_depth=8, use_pallas=False))
    got = np.asarray(trace_inline(
        scene, org, d, 0, max_depth=8,
        interpret=True, rng_u5=jnp.full((8, 5, R), 0.5)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_inline_sample_chunking_statistical(monkeypatch):
    # Force multi-pass lane chunking. Pass splits re-key the pixel jitter
    # (the pass_body stream contract), so equality is statistical — but the
    # centered global sample 0 is jitter-free, bounding the drift tightly on
    # a smooth mirror scene.
    scene = make_scene([metal((0, -100.0, 0), 99.0, (0.8, 0.6, 0.4), 0.0)])
    cam = default_camera((0, 2, 0), (1, 1, 0))
    W, H, spp = 32, 18, 4
    u, v = pixel_coords(W, H)
    fw, fh = float(np.float32(W)), float(np.float32(H))
    full = np.asarray(render_inline_sum(scene, cam, u, v, KEY, spp, 0, 16,
                                        1e-4, fw, fh, interpret=True))
    monkeypatch.setattr(inline_kernel, "INLINE_MAX_LANES", W * H * 2)
    chunked = np.asarray(render_inline_sum(scene, cam, u, v, KEY, spp, 0, 16,
                                           1e-4, fw, fh, interpret=True))
    assert np.isfinite(chunked).all()
    assert abs(chunked.mean() - full.mean()) < 0.01 * spp
    assert np.abs(chunked - full).mean() / spp < 0.06


def test_inline_sample_offset_centered_rule():
    # Only GLOBAL sample 0 takes the centered path: with sample_offset > 0
    # every sample is jittered, so offset-0 and offset-k runs differ on a
    # jitter-sensitive scene but both stay finite/valid.
    scene = scene_2_spheres()
    cam = t_default_cam()
    W, H = 32, 18
    u, v = pixel_coords(W, H)
    fw, fh = float(np.float32(W)), float(np.float32(H))
    a = np.asarray(render_inline_sum(scene, cam, u, v, KEY, 2, 0, 8, 1e-4,
                                     fw, fh, interpret=True))
    b = np.asarray(render_inline_sum(scene, cam, u, v, KEY, 2, 2, 8, 1e-4,
                                     fw, fh, interpret=True))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.array_equal(a, b)
