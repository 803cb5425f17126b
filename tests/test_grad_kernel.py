"""Fused record/replay kernel-pair gradient path (ops/pallas/grad_kernel.py).

Validation strategy (interpret mode — the hand-written Pallas adjoint runs as
plain JAX on CPU):

1. a pure-JAX *twin* of the record forward (same per-bounce uniforms via
   ``_u5_for``, same XLA intersect, same ``_shade_core`` math, same masked
   state advance) must reproduce the kernel's radiance bit-for-bit;
2. ``jax.grad`` of that twin (autodiff) must match the hand-written replay
   adjoint on every differentiable scene field AND on ray origins/directions;
3. finite differences of the fused program itself must match its own VJP
   (self-consistency — record and replay share draws exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingweekend_jl_tpu import make_scene, lambertian, metal, dielectric
from raytracingweekend_jl_tpu.camera import default_camera, get_rays
from raytracingweekend_jl_tpu.ops.intersect import intersect_spheres, BIG
from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import (
    trace_recorded_fused, _attr_mat, _u5_for)
from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import LANES
from raytracingweekend_jl_tpu.ops.pallas.shade_kernel import (_shade_core,
                                                              SHADE_ROWS)
from raytracingweekend_jl_tpu.render import pixel_coords
from raytracingweekend_jl_tpu import rng as rngmod


def mixed_scene():
    """All three materials in view so every adjoint branch is exercised."""
    return make_scene([
        lambertian((0, 0, -1), 0.5, (0.7, 0.3, 0.3)),
        lambertian((0, -100.5, -1), 100.0, (0.8, 0.8, 0.0)),
        metal((1, 0, -1), 0.5, (0.8, 0.6, 0.2), 0.3),
        dielectric((-1, 0, -1), 0.5, 1.5),
    ], pad_to=4)


def rays_for(scene, W=32, H=18, seed=7):
    cam = default_camera()
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(seed)
    o, d = get_rays(cam, u, v, rngmod.purpose_key(key, rngmod.LENS))
    tk = rngmod.purpose_key(key, rngmod.SCATTER_DIR)
    return o, d, tk


def twin_forward(scene, origin, direction, key, max_depth=8, tmin=1e-4):
    """Pure-JAX replica of the fused record forward — flat [R] arrays, same
    uniforms, same intersect, same ``_shade_core``, same masked advance."""
    R = origin.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // SHADE_ROWS) * SHADE_ROWS
    amat = _attr_mat(scene)
    f32 = jnp.float32

    o = origin.astype(f32)
    d = direction.astype(f32)
    thr = jnp.ones((R, 3), f32)
    rad = jnp.zeros((R, 3), f32)
    alive = jnp.ones((R,), bool)

    for b in range(max_depth):
        res = intersect_spheres(o, d, scene, tmin=tmin)
        attrs10 = amat[res.index]
        t = jnp.where(res.hit, res.t, jnp.float32(BIG)).astype(f32)
        u5 = _u5_for(key, b, rows).reshape(5, -1)[:, :R]
        attrs_vals = tuple(attrs10[:, i] for i in range(10))
        (rx, ry, rz, hitm, _miss, px, py, pz, ndx, ndy, ndz,
         aar, aag, aab) = _shade_core(
            u5, t, attrs_vals, o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], thr[:, 0], thr[:, 1], thr[:, 2],
            rad[:, 0], rad[:, 1], rad[:, 2], alive)
        rad = jnp.stack([rx, ry, rz], axis=-1)
        hf = hitm.astype(f32)[:, None]
        o = hf * jnp.stack([px, py, pz], -1) + (1 - hf) * o
        d = hf * jnp.stack([ndx, ndy, ndz], -1) + (1 - hf) * d
        thr = jnp.where(hitm[:, None],
                        thr * jnp.stack([aar, aag, aab], -1), thr)
        alive = hitm
    return rad


def test_fused_forward_matches_twin():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    out = np.asarray(trace_recorded_fused(scene, o, d, tk, 8, 1e-4, True))
    ref = np.asarray(twin_forward(scene, o, d, tk, 8))
    assert np.isfinite(out).all()
    # Same draws, same math — ulp-level reassociation only (interpret-mode
    # fusion order differs from the flat twin's).
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_fused_vjp_matches_twin_autodiff():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    g_out = jax.random.normal(jax.random.PRNGKey(0), (o.shape[0], 3),
                              jnp.float32)

    def loss_fused(sc, oo, dd):
        return jnp.vdot(trace_recorded_fused(sc, oo, dd, tk, 8, 1e-4, True),
                        g_out)

    def loss_twin(sc, oo, dd):
        return jnp.vdot(twin_forward(sc, oo, dd, tk, 8), g_out)

    gs_f, go_f, gd_f = jax.grad(loss_fused, argnums=(0, 1, 2), allow_int=True)(scene, o, d)
    gs_t, go_t, gd_t = jax.grad(loss_twin, argnums=(0, 1, 2), allow_int=True)(scene, o, d)

    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a = np.asarray(getattr(gs_f, f))
        b = np.asarray(getattr(gs_t, f))
        scale = max(np.abs(b).max(), 1e-6)
        # Hand-written adjoint vs XLA autodiff: identical math graphs modulo
        # expression order (f32 reassociation) and the implicit-t form vs
        # autodiff-through-the-quadratic; tolerance is float32-tight.
        np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale, err_msg=f)
    a, b = np.asarray(go_f), np.asarray(go_t)
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="origin")
    # Direction cotangents live on the unit sphere: the a==1 quadratic
    # (ops/intersect.py "a == 1") makes autodiff's dt/dd = -t(o-c)/denom
    # while the kernel's implicit form uses (p-c) = (o-c) + t d — the two
    # differ by t^2 d/denom, a pure gauge ALONG d that any upstream
    # normalize() VJP projects out. Compare the tangential components.
    dn = np.asarray(d)
    proj = lambda g: g - (np.sum(g * dn, -1, keepdims=True)) * dn
    a, b = proj(np.asarray(gd_f)), proj(np.asarray(gd_t))
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="direction (tangential)")


def test_fused_fd_self_consistency_albedo():
    # Radiance is polynomial in albedo → f32 central differences of the SAME
    # program are trustworthy at eps=1e-2.
    scene = mixed_scene()
    o, d, tk = rays_for(scene)

    def loss(sc):
        r = trace_recorded_fused(sc, o, d, tk, 8, 1e-4, True)
        return jnp.mean(r * r)

    g = jax.grad(loss, allow_int=True)(scene)
    g_ad = float(np.asarray(g.albedo)[0, 0])

    def loss_at(delta):
        arr = np.asarray(scene.albedo).copy()
        arr[0, 0] += delta
        return float(loss(scene._replace(albedo=jnp.asarray(arr))))

    eps = 1e-2
    g_fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert abs(g_ad) > 0
    np.testing.assert_allclose(g_ad, g_fd, rtol=3e-2, atol=1e-6)


def test_fused_mat_and_key_not_differentiated():
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=16, H=9)

    def loss(sc):
        return jnp.sum(trace_recorded_fused(sc, o, d, tk, 4, 1e-4, True))

    g = jax.grad(loss, allow_int=True)(scene)
    # mat is an integer code: its cotangent must be float0 (detached).
    assert g.mat.dtype == jax.dtypes.float0


# ---------------------------------------------------------------------------
# Staged variant
# ---------------------------------------------------------------------------

from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import (
    trace_recorded_fused_staged)


def test_staged_single_stage_equals_unstaged(monkeypatch):
    # stages=((0,1),) runs one full-width stage: same seeds, same widths,
    # same draws => identical radiance AND gradients. The staged bwd only
    # has the per-bounce loop replay, so pin the unstaged side to the same
    # mode (the fused whole-phase replay — default since round 4 — matches
    # it only to f32 accumulation order).
    monkeypatch.setenv("RTW_REPLAY_FUSED", "0")
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    a = np.asarray(trace_recorded_fused(scene, o, d, tk, 8, 1e-4, True))
    b = np.asarray(trace_recorded_fused_staged(scene, o, d, tk, 8, 1e-4,
                                               True, ((0, 1),)))
    np.testing.assert_array_equal(a, b)

    def l_un(sc):
        return jnp.mean(trace_recorded_fused(sc, o, d, tk, 8, 1e-4, True) ** 2)

    def l_st(sc):
        return jnp.mean(trace_recorded_fused_staged(
            sc, o, d, tk, 8, 1e-4, True, ((0, 1),)) ** 2)

    ga = jax.grad(l_un, allow_int=True)(scene)
    gb = jax.grad(l_st, allow_int=True)(scene)
    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        np.testing.assert_array_equal(np.asarray(getattr(ga, f)),
                                      np.asarray(getattr(gb, f)), err_msg=f)


def test_staged_radiance_statistical():
    # Staged widths reseed the per-block PRNG: different draws, same
    # integral.
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=64, H=36)
    a = np.asarray(trace_recorded_fused(scene, o, d, tk, 8, 1e-4, True))
    b = np.asarray(trace_recorded_fused_staged(
        scene, o, d, tk, 8, 1e-4, True, ((0, 1), (2, 2), (4, 4))))
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.02


def test_staged_fd_self_consistency_albedo():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    stages = ((0, 1), (2, 2), (4, 4))

    def loss(sc):
        r = trace_recorded_fused_staged(sc, o, d, tk, 8, 1e-4, True, stages)
        return jnp.mean(r * r)

    g = jax.grad(loss, allow_int=True)(scene)
    g_ad = float(np.asarray(g.albedo)[0, 0])

    def loss_at(delta):
        arr = np.asarray(scene.albedo).copy()
        arr[0, 0] += delta
        return float(loss(scene._replace(albedo=jnp.asarray(arr))))

    eps = 1e-2
    g_fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert abs(g_ad) > 0
    np.testing.assert_allclose(g_ad, g_fd, rtol=3e-2, atol=1e-6)


def twin_forward_staged(scene, origin, direction, key, max_depth, stages,
                        tmin=1e-4):
    """Pure-JAX replica of the STAGED record forward: same positional
    uniforms per stage width, same cumsum partition, same radiance banking.
    ``jax.grad`` of this twin is the ground truth for the hand-written
    boundary cotangent expansion (geometry FD is invalid for the staged
    program: a perturbed alive mask reshuffles the partition and re-deals
    every downstream positional draw — same discontinuity class as the
    documented silhouette terms, so AD-vs-AD is the right check)."""
    from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import (
        _stage_plan, _partition_alive)
    R = origin.shape[0]
    plan = _stage_plan(R, max_depth, stages)
    amat = _attr_mat(scene)
    f32 = jnp.float32

    def padto(x, n):
        pad = jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, pad], 0)

    R0 = plan[0][2] * LANES
    o = padto(origin.astype(f32), R0)
    d = padto(direction.astype(f32), R0)
    thr = jnp.ones((R0, 3), f32)
    rad = jnp.zeros((R0, 3), f32)
    alive = jnp.arange(R0) < R
    ids = jnp.arange(R0, dtype=jnp.int32)
    rad_accum = jnp.zeros((R, 3), f32)

    for s, (b0, b1, rows_s) in enumerate(plan):
        Rs = rows_s * LANES
        if s > 0:
            order, _ = _partition_alive(alive)
            rad_accum = rad_accum.at[ids].add(rad, mode="drop")
            sel = order[:Rs]
            o, d, thr = o[sel], d[sel], thr[sel]
            alive, ids = alive[sel], ids[sel]
            rad = jnp.zeros((Rs, 3), f32)
        for b in range(b0, b1):
            res = intersect_spheres(o, d, scene, tmin=tmin)
            attrs10 = amat[res.index]
            t = jnp.where(res.hit, res.t, jnp.float32(BIG)).astype(f32)
            u5 = _u5_for(key, b, rows_s).reshape(5, -1)
            attrs_vals = tuple(attrs10[:, i] for i in range(10))
            (rx, ry, rz, hitm, _miss, px, py, pz, ndx, ndy, ndz,
             aar, aag, aab) = _shade_core(
                u5, t, attrs_vals, o[:, 0], o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2], thr[:, 0], thr[:, 1], thr[:, 2],
                rad[:, 0], rad[:, 1], rad[:, 2], alive)
            rad = jnp.stack([rx, ry, rz], axis=-1)
            hf = hitm.astype(f32)[:, None]
            o = hf * jnp.stack([px, py, pz], -1) + (1 - hf) * o
            d = hf * jnp.stack([ndx, ndy, ndz], -1) + (1 - hf) * d
            thr = jnp.where(hitm[:, None],
                            thr * jnp.stack([aar, aag, aab], -1), thr)
            alive = hitm
    return rad_accum.at[ids].add(rad, mode="drop")


def test_staged_forward_matches_twin():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    stages = ((0, 1), (2, 2), (4, 4))
    out = np.asarray(trace_recorded_fused_staged(scene, o, d, tk, 8, 1e-4,
                                                 True, stages))
    ref = np.asarray(twin_forward_staged(scene, o, d, tk, 8, stages))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_staged_vjp_matches_twin_autodiff():
    # Center/radius/origin/direction cotangents cross the compaction
    # boundaries (gather in the twin, hand-written scatter expansion in the
    # kernel path): autodiff of the twin is the exact ground truth.
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    stages = ((0, 1), (2, 2), (4, 4))
    g_out = jax.random.normal(jax.random.PRNGKey(0), (o.shape[0], 3),
                              jnp.float32)

    def loss_staged(sc, oo, dd):
        return jnp.vdot(trace_recorded_fused_staged(
            sc, oo, dd, tk, 8, 1e-4, True, stages), g_out)

    def loss_twin(sc, oo, dd):
        return jnp.vdot(twin_forward_staged(sc, oo, dd, tk, 8, stages), g_out)

    gs_f, go_f, gd_f = jax.grad(loss_staged, argnums=(0, 1, 2),
                                allow_int=True)(scene, o, d)
    gs_t, go_t, gd_t = jax.grad(loss_twin, argnums=(0, 1, 2),
                                allow_int=True)(scene, o, d)

    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a = np.asarray(getattr(gs_f, f))
        b = np.asarray(getattr(gs_t, f))
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale, err_msg=f)
    a, b = np.asarray(go_f), np.asarray(go_t)
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="origin")
    dn = np.asarray(d)
    proj = lambda g: g - (np.sum(g * dn, -1, keepdims=True)) * dn
    a, b = proj(np.asarray(gd_f)), proj(np.asarray(gd_t))
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="direction (tangential)")


def test_fused_replay_whole_walk_matches_loop(monkeypatch):
    """RTW_REPLAY_FUSED=1 on the fixed-depth pair (whole reverse bounce walk
    as one pallas_call, carries resident) must reproduce the per-bounce loop
    replay: identical loss, BITWISE ray gradients, scene gradients equal up
    to f32 accumulation order in the per-bounce contraction scan."""
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    g_out = jax.random.normal(jax.random.PRNGKey(5), (o.shape[0], 3),
                              jnp.float32)

    def loss(sc, oo, dd):
        r = trace_recorded_fused(sc, oo, dd, tk, 8, 1e-4, True)
        return jnp.vdot(r, g_out)

    monkeypatch.delenv("RTW_REPLAY_FUSED", raising=False)
    l_loop, (gs_l, go_l, gd_l) = jax.value_and_grad(
        loss, argnums=(0, 1, 2), allow_int=True)(scene, o, d)
    monkeypatch.setenv("RTW_REPLAY_FUSED", "1")
    l_fused, (gs_f, go_f, gd_f) = jax.value_and_grad(
        loss, argnums=(0, 1, 2), allow_int=True)(scene, o, d)

    assert float(l_loop) == float(l_fused)
    np.testing.assert_array_equal(np.asarray(go_l), np.asarray(go_f),
                                  err_msg="origin")
    np.testing.assert_array_equal(np.asarray(gd_l), np.asarray(gd_f),
                                  err_msg="direction")
    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a, b = np.asarray(getattr(gs_l, f)), np.asarray(getattr(gs_f, f))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=1e-6 + 1e-5 * scale, err_msg=f)
