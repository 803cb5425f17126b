"""Camera tests — frame construction and batched ray generation
(reference: src/camera.jl:18-48)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import (default_camera, get_rays, t_cam1, t_cam2,
                                      t_default_cam)


def rays(cam, s, t, key=jax.random.PRNGKey(0)):
    o, d = get_rays(cam, jnp.asarray(s, jnp.float32), jnp.asarray(t, jnp.float32), key)
    return np.asarray(o), np.asarray(d)


def test_default_camera_frame():
    cam = t_default_cam()
    # vfov 90 → viewport height 2, width 32/9 (reference: src/camera.jl:23-24).
    np.testing.assert_allclose(np.asarray(cam.vertical), [0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.horizontal), [32 / 9, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.w), [0, 0, 1], atol=1e-6)
    assert float(cam.lens_radius) == 0.0


def test_center_ray_points_forward():
    cam = t_default_cam()
    o, d = rays(cam, [0.5], [0.5])
    np.testing.assert_allclose(o[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)


def test_directions_unit():
    cam = t_cam1()
    s = np.random.default_rng(0).uniform(0, 1, 128)
    t = np.random.default_rng(1).uniform(0, 1, 128)
    _, d = rays(cam, s, t)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_zero_aperture_is_deterministic():
    # aperture 0 ⇒ lens offset exactly 0 regardless of the key
    # (reference: rd scales by lens_radius=0, src/camera.jl:44).
    cam = t_default_cam()
    o1, d1 = rays(cam, [0.25], [0.75], jax.random.PRNGKey(1))
    o2, d2 = rays(cam, [0.25], [0.75], jax.random.PRNGKey(2))
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(d1, d2)


def test_aperture_spreads_origins_within_lens():
    cam = t_cam2()  # aperture 2.0 → lens radius 1.0
    o, _ = rays(cam, np.full(256, 0.5), np.full(256, 0.5))
    offs = o - np.asarray(cam.origin)
    # Offsets lie in the (u, v) lens plane within lens_radius.
    u, v = np.asarray(cam.u), np.asarray(cam.v)
    a = offs @ u
    b = offs @ v
    r = np.sqrt(a ** 2 + b ** 2)
    assert r.max() <= float(cam.lens_radius) + 1e-5
    assert r.std() > 0.05  # actually spread
    # No component off the lens plane.
    w = np.asarray(cam.w)
    np.testing.assert_allclose(offs @ w, 0.0, atol=1e-5)


def test_cam1_center_ray_hits_focus_point():
    # t_cam1 has aperture 0.1: the center-film ray converges at the focus-plane
    # center ``origin - focus_dist * w`` for ANY lens sample
    # (reference: src/camera.jl:31,45-47 geometry; focus_dist 10).
    cam = t_cam1()
    focus_pt = np.asarray(cam.origin) - 10.0 * np.asarray(cam.w)
    for seed in (0, 1, 2):
        o, d = rays(cam, [0.5], [0.5], jax.random.PRNGKey(seed))
        t_plane = (focus_pt - o[0]) @ (-np.asarray(cam.w)) / (d[0] @ (-np.asarray(cam.w)))
        np.testing.assert_allclose(o[0] + t_plane * d[0], focus_pt, atol=1e-3)
    # The lookat point (0,0,0) lies on the no-offset center ray's line: with
    # aperture forced to 0 the ray passes through it at t = |origin|.
    from raytracingweekend_jl_tpu import default_camera
    cam0 = default_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 16.0 / 9.0,
                          0.0, 10.0)
    o, d = rays(cam0, [0.5], [0.5])
    np.testing.assert_allclose(o[0] + np.linalg.norm(o[0]) * d[0], [0, 0, 0],
                               atol=1e-3)


def test_focus_plane_convergence():
    # With aperture > 0, rays for the same film point from different lens
    # offsets converge at the focus plane (the whole point of defocus blur).
    cam = t_cam2()
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    pts = []
    focus = float(np.linalg.norm(np.array([3.0, 3.0, 2.0]) - np.array([0.0, 0.0, -1.0])))
    for k in keys:
        o, d = rays(cam, [0.5], [0.5], k)
        # Intersect with the focus plane: origin + t*d where t chosen so the
        # point is focus_dist along -w from cam origin.
        w = np.asarray(cam.w)
        t_plane = (focus - (o[0] - np.asarray(cam.origin)) @ (-w)) / (d[0] @ (-w))
        pts.append(o[0] + t_plane * d[0])
    pts = np.stack(pts)
    assert np.abs(pts - pts[0]).max() < 1e-3
