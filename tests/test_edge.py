"""Boundary-aware gradient estimator (ops/edge.py).

The reference has no autodiff at all and the interior-only AD paths cannot
see silhouettes (grad.py docstring; reference discontinuity anchor:
src/hit.jl:23-29's root selection). These tests pin the edge estimator's
three contracts:

1. the PRIMAL is exactly the hard render (the straight-through blend is
   zero in value);
2. the center gradient agrees with finite differences of the hard loss in
   direction (cosine) where interior-only AD is wrong in sign;
3. an AD-only center fit DESCENDS on the 4-sphere demo — the north-star
   capability interior AD provably lacks (optimize.py measured it walking
   uphill).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.camera import t_default_cam, get_rays
from raytracingweekend_jl_tpu.ops.edge import (render_radiance_edge,
                                               trace_edge, silhouette_coords)
from raytracingweekend_jl_tpu.ops.integrator import trace
from raytracingweekend_jl_tpu.render import pixel_coords, render_radiance
from raytracingweekend_jl_tpu.scene import make_scene, lambertian, metal
import raytracingweekend_jl_tpu.rng as rng

W, H, SPP = 64, 36, 2


def _ground_scene():
    return make_scene([lambertian((0, 0, -1), 0.5, (0.7, 0.3, 0.3)),
                       lambertian((0, -100.5, -1), 100, (0.8, 0.8, 0.0))],
                      pad_to=8)


def test_edge_primal_bitwise_matches_keyed_trace():
    """The straight-through blend must be zero in VALUE: trace_edge ==
    trace(keyed=True) bitwise (same slot-keyed RNG stream family)."""
    scene = _ground_scene()
    cam = t_default_cam()
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(0)
    o, d = get_rays(cam, u, v, rng.purpose_key(key, rng.LENS))
    tk = rng.purpose_key(key, rng.SCATTER_DIR)
    ref = np.asarray(trace(scene, o, d, tk, keyed=True))
    for eb in (1, 2):
        out = np.asarray(trace_edge(scene, o, d, tk, sigma=0.05,
                                    edge_bounces=eb))
        np.testing.assert_array_equal(out, ref)


def test_silhouette_coords_consistent_with_intersect():
    """rooted/t_int must reproduce intersect_spheres' closest hit exactly,
    and behind-the-ray spheres must never count as rooted (the t=tmin
    hallucination bug this module shipped with and fixed)."""
    from raytracingweekend_jl_tpu.ops.intersect import intersect_spheres
    scene = _ground_scene()
    cam = t_default_cam()
    u, v = pixel_coords(W, H)
    o, d = get_rays(cam, u, v, jax.random.PRNGKey(3))
    res, s, t_int, rooted = silhouette_coords(o, d, scene)
    ref = intersect_spheres(o, d, scene)
    np.testing.assert_array_equal(np.asarray(res.index), np.asarray(ref.index))
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(ref.t))
    # Sky rays (pointing up) cross the ground sphere's LINE only behind the
    # origin: it must not be rooted for them.
    up = np.asarray(d)[:, 1] > 0.3
    miss = ~np.asarray(res.hit)
    sky_up = up & miss
    assert sky_up.sum() > 100  # the probe covers real sky
    assert not np.asarray(rooted)[sky_up, 1].any()


@pytest.mark.parametrize("disp", [(0.2, 0, 0), (0, 0, 0.2), (0, 0.15, 0)])
def test_edge_center_gradient_matches_fd(disp):
    """FD of the hard MSE vs edge-AD: cosine >= 0.8 on the ground scene —
    the configuration where interior-only AD is wrong in sign (the y case
    is the contact-shadow one that needs the without-branch behind e)."""
    scene = _ground_scene()
    cam = t_default_cam()
    target = render_radiance(scene, cam, W, SPP, image_height=H, seed=7)

    def loss_edge(center):
        img = render_radiance_edge(scene._replace(center=center), cam, W,
                                   SPP, image_height=H, seed=0, sigma=0.05,
                                   edge_bounces=1)
        return jnp.mean((img - target) ** 2)

    def loss_plain(center):
        img = render_radiance(scene._replace(center=center), cam, W, SPP,
                              image_height=H, seed=0)
        return jnp.mean((img - target) ** 2)

    c0 = np.asarray(scene.center).copy()
    c0[0] += np.asarray(disp)
    c0 = jnp.asarray(c0)
    g = np.asarray(jax.grad(loss_edge)(c0)[0])

    eps = 1e-3
    fd = np.zeros(3)
    for j in range(3):
        cp = np.asarray(c0).copy(); cp[0, j] += eps
        cm = np.asarray(c0).copy(); cm[0, j] -= eps
        fd[j] = (float(loss_plain(jnp.asarray(cp)))
                 - float(loss_plain(jnp.asarray(cm)))) / (2 * eps)
    cos = float(fd @ g / (np.linalg.norm(fd) * np.linalg.norm(g) + 1e-12))
    assert cos >= 0.8, (disp, fd, g, cos)


def test_edge_radius_gradient_sign():
    """Growing a sphere that should shrink raises the loss: dL/dr > 0 when
    the current radius exceeds the target's — a pure boundary signal
    (interior AD sees radius only through shading, not coverage)."""
    scene = _ground_scene()
    cam = t_default_cam()
    target = render_radiance(scene, cam, W, SPP, image_height=H, seed=7)
    r0 = np.asarray(scene.radius).copy()
    r0[0] = 0.58  # oversized vs the 0.5 target
    r0 = jnp.asarray(r0)

    def loss_edge(radius):
        img = render_radiance_edge(scene._replace(radius=radius), cam, W,
                                   SPP, image_height=H, seed=0, sigma=0.05,
                                   edge_bounces=1)
        return jnp.mean((img - target) ** 2)

    g = float(jax.grad(loss_edge)(r0)[0])
    assert g > 0, g


def test_fit_scene_edge_ad_descends_geometry():
    """North-star demo: an AD-ONLY center fit (no SPSA probes) descends on
    the 4-sphere scene. Interior-only AD measured walking centers uphill
    on this exact setup (loss 0.0115 -> 0.101, center err 0.114 -> 0.439
    over the same 20 steps); the edge estimator must recover instead."""
    from raytracingweekend_jl_tpu.optimize import fit_scene, movable_mask
    scene_true = rtw.ALL_SCENES["4_spheres"]()
    movable = movable_mask(scene_true)
    k = jax.random.PRNGKey(7)
    jit = np.array(jax.random.uniform(k, scene_true.center.shape,
                                      minval=-0.12, maxval=0.12))
    jit[~movable] = 0.0
    scene0 = scene_true._replace(
        center=jnp.asarray(np.asarray(scene_true.center) + jit))
    cam = t_default_cam()
    target = render_radiance(scene_true, cam, 48, SPP, image_height=27,
                             seed=0)

    res = fit_scene(scene0, cam, target, 48, SPP, steps=25, seed=0,
                    lr_albedo=0.0, lr_center=1.2e-2, geom="edge",
                    edge_kwargs=dict(sigma=0.06, edge_bounces=1))
    assert all(np.isfinite(res.losses))
    assert res.losses[-1] < 0.85 * res.losses[0], res.losses
    c_err0 = np.abs(np.asarray(scene0.center
                               - scene_true.center))[movable].max()
    c_err1 = np.abs(np.asarray(res.scene.center
                               - scene_true.center))[movable].max()
    assert c_err1 < 0.6 * c_err0, (c_err0, c_err1)


def test_edge_handles_metal_and_auto_sigma():
    """Estimator smoke on a metal sphere with per-ray footprint sigma
    (sigma=None): finite gradients, primal finite, boundary term present."""
    scene = make_scene([metal((0, 0, -1), 0.5, (0.8, 0.7, 0.2), 0.1),
                        lambertian((0, -100.5, -1), 100, (0.5, 0.5, 0.5))],
                       pad_to=8)
    cam = t_default_cam()
    target = render_radiance(scene, cam, W, SPP, image_height=H, seed=7)
    c0 = np.asarray(scene.center).copy()
    c0[0, 0] += 0.15
    c0 = jnp.asarray(c0)

    def loss_edge(center):
        img = render_radiance_edge(scene._replace(center=center), cam, W,
                                   SPP, image_height=H, seed=0, sigma=None,
                                   sigma_px=1.5, edge_bounces=1)
        return jnp.mean((img - target) ** 2)

    loss, g = jax.value_and_grad(loss_edge)(c0)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    # boundary term dominates interior for x-displacement: gradient must
    # point back toward the target (positive x component).
    assert float(g[0, 0]) > 0, np.asarray(g[0])


def test_edge_remat_chunks_matches_plain():
    """remat_chunks (scan over checkpointed chunks — O(1) residual memory)
    matches the plain chunked render. Tolerances are ulp-class, not exact:
    the recompute compiles differently and a threshold-straddling band ray
    may flip its hard select (measured: 1 pixel of 2048 at 1e-6, gradient
    ~2% on one ray's term — noise-level for a fit path)."""
    scene = _ground_scene()
    cam = t_default_cam()
    a = np.asarray(render_radiance_edge(scene, cam, 64, 2, image_height=32,
                                        seed=0, sigma=0.05, pixel_chunk=512))
    b = np.asarray(render_radiance_edge(scene, cam, 64, 2, image_height=32,
                                        seed=0, sigma=0.05, pixel_chunk=512,
                                        remat_chunks=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_edge_signed_radius_hollow_glass():
    """Signed-radius (hollow shell) semantics through the edge path: the
    hollow-glass scene's negative-radius inner shell must produce a finite
    primal equal to the hard keyed trace and finite center gradients (the
    forced-graze branch flips r_eff with sign(r); |r| guards the
    silhouette coordinate's denominator)."""
    import raytracingweekend_jl_tpu as rtw
    scene = rtw.scene_diel_spheres_hollow()
    cam = rtw.hollow_glass_cam()
    u, v = pixel_coords(64, 36)
    key = jax.random.PRNGKey(2)
    o, d = get_rays(cam, u, v, rng.purpose_key(key, rng.LENS))
    tk = rng.purpose_key(key, rng.SCATTER_DIR)
    ref = np.asarray(trace(scene, o, d, tk, keyed=True))
    out = np.asarray(trace_edge(scene, o, d, tk, sigma=0.05,
                                edge_bounces=1))
    np.testing.assert_array_equal(out, ref)

    def loss(center):
        img = render_radiance_edge(scene._replace(center=center), cam, 64,
                                   2, image_height=36, seed=0, sigma=0.05,
                                   edge_bounces=1)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(scene.center))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_edge_misuse_raises():
    """Loud-failure contracts from the round-5 review: remat without
    effective chunking, and fit render_kwargs under geom='edge'."""
    from raytracingweekend_jl_tpu.optimize import fit_scene
    scene = _ground_scene()
    cam = t_default_cam()
    with pytest.raises(ValueError, match="remat_chunks"):
        render_radiance_edge(scene, cam, 512, 1, image_height=512,
                             seed=0, sigma=0.05, remat_chunks=True)
    target = jnp.zeros((27, 48, 3))
    with pytest.raises(ValueError, match="render_kwargs"):
        fit_scene(scene, cam, target, 48, 1, steps=1, geom="edge",
                  render_kwargs={"recorded": True},
                  edge_kwargs=dict(sigma=0.05))
