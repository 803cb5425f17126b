"""Persistent-record kernel-pair gradient path (ops/pallas/persist_grad_kernel).

Same validation strategy as the fixed-depth fused suite (test_grad_kernel.py):

1. a pure-JAX *twin* of the persistent record forward (same per-iteration
   uniforms, same XLA intersect, same ``_shade_core`` math, same strip
   refill/banking state machine) must reproduce the kernel's radiance;
2. ``jax.grad`` of that twin (autodiff through the whole persistent loop,
   including the regen-boundary chain cuts that ``jnp.where`` encodes) must
   match the hand-written replay adjoint on scene fields AND rays;
3. finite differences of the persistent program itself must match its own
   VJP (record and replay share draws exactly);
4. the static-iteration-budget overflow contract: dropped == 0 at the default
   budget, and a deliberately starved budget reports dropped > 0 while the
   gradients remain finite and self-consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import make_scene, lambertian, metal, dielectric
from raytracingweekend_jl_tpu.camera import default_camera, get_rays
from raytracingweekend_jl_tpu.ops.intersect import intersect_spheres, BIG
from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import _attr_mat
from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
    trace_recorded_persist, persist_dropped_paths, _strip_geometry, _u5_for,
    _strip_delta, default_n_iters)
from raytracingweekend_jl_tpu.ops.pallas.shade_kernel import _shade_core
from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import LANES
from raytracingweekend_jl_tpu.render import pixel_coords
from raytracingweekend_jl_tpu import rng as rngmod


def mixed_scene():
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


S = 4
DEPTH = 8


def twin_persist(scene, origin, direction, key, max_depth=DEPTH,
                 n_strips=S, n_iters=None, tmin=1e-4):
    """Pure-JAX replica of the persistent record forward: flat [W] lanes,
    strip refill via the same masked selects the kernel uses."""
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    R = origin.shape[0]
    rows, W = _strip_geometry(R, n_strips)
    delta = _strip_delta(W)
    amat = _attr_mat(scene)
    f32 = jnp.float32

    def strips(x, dummy):
        xp = jnp.concatenate(
            [x.astype(f32),
             jnp.broadcast_to(jnp.asarray(dummy, f32),
                              (n_strips * W - R, 3))]).reshape(n_strips, W, 3)
        return jnp.stack([jnp.roll(xp[c], -c * delta, axis=0)
                          for c in range(n_strips)])

    so = strips(origin, (0.0, 0.0, 0.0))
    sd = strips(direction, (0.0, 1.0, 0.0))
    o, d = so[0], sd[0]
    thr = jnp.ones((W, 3), f32)
    bo = jnp.zeros((W,), jnp.int32)
    sp = jnp.zeros((W,), jnp.int32)
    act = jnp.ones((W,), bool)
    rad = jnp.zeros((n_strips, W, 3), f32)

    for i in range(n_iters):
        res = intersect_spheres(o, d, scene, tmin=tmin)
        t = jnp.where(res.hit & act, res.t, jnp.float32(BIG)).astype(f32)
        attrs10 = amat[res.index]
        u5 = _u5_for(key, i, rows).reshape(5, -1)
        attrs_vals = tuple(attrs10[:, j] for j in range(10))
        zf = jnp.zeros((W,), f32)
        (bkr, bkg, bkb, hitm, miss, px, py, pz, ndx, ndy, ndz,
         aar, aag, aab) = _shade_core(
            u5, t, attrs_vals, o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], thr[:, 0], thr[:, 1], thr[:, 2],
            zf, zf, zf, act)

        newb = bo + 1
        cont = hitm & (newb < max_depth)
        exhausted = hitm & ~cont
        term = miss | exhausted
        nxt_s = sp + 1
        can = term & (nxt_s < n_strips)

        bank = jnp.stack([bkr, bkg, bkb], axis=-1)
        for c in range(n_strips):
            sel = (miss & (sp == c))[:, None]
            rad = rad.at[c].set(jnp.where(sel, bank, rad[c]))

        hf = cont.astype(f32)[:, None]
        o = hf * jnp.stack([px, py, pz], -1) + (1 - hf) * o
        d = hf * jnp.stack([ndx, ndy, ndz], -1) + (1 - hf) * d
        thr = jnp.where(cont[:, None],
                        thr * jnp.stack([aar, aag, aab], -1), thr)
        bo = jnp.where(cont, newb, bo)

        for c in range(1, n_strips):
            sel = (can & (nxt_s == c))[:, None]
            o = jnp.where(sel, so[c], o)
            d = jnp.where(sel, sd[c], d)
        thr = jnp.where(can[:, None], 1.0, thr)
        bo = jnp.where(can, 0, bo)
        sp = jnp.where(can, nxt_s, sp)
        act = (act & ~term) | can

    rad = jnp.stack([jnp.roll(rad[c], c * delta, axis=0)
                     for c in range(n_strips)])
    return rad.reshape(n_strips * W, 3)[:R]


def test_persist_forward_matches_twin():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    out = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                            S, None, True))
    ref = np.asarray(twin_persist(scene, o, d, tk))
    assert np.isfinite(out).all()
    # Same draws, same math; the persistent loop runs more masked-blend
    # iterations than the fixed-depth path, so interpret-mode fusion (FMA)
    # vs the flat twin drifts a few more ulps on long throughput chains.
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_persist_zero_dropped_at_default_budget():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    drop = persist_dropped_paths(scene, o, d, tk, DEPTH, 1e-4, S, None, True)
    assert int(drop) == 0


def test_persist_overflow_contract():
    # A starved budget must REPORT the dropped paths and keep the primal
    # finite and <= the full render (dropped rays read black).
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    full = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                             S, None, True))
    tiny = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                             S, 3, True))
    drop = int(persist_dropped_paths(scene, o, d, tk, DEPTH, 1e-4, S, 3, True))
    assert drop > 0
    assert np.isfinite(tiny).all()
    assert tiny.sum() < full.sum()
    # Gradients of the truncated program stay finite (self-consistent).
    g = jax.grad(lambda sc: jnp.mean(trace_recorded_persist(
        sc, o, d, tk, DEPTH, 1e-4, S, 3, True) ** 2), allow_int=True)(scene)
    assert np.isfinite(np.asarray(g.albedo)).all()


def test_persist_strict_poisons_on_drop():
    # strict=True: ANY dropped path must NaN the primal — and through the
    # loss cotangents every gradient — instead of silently biasing low
    # (the auto-selected tail-compacted default runs strict; ADVICE r3).
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    starved = np.asarray(trace_recorded_persist(
        scene, o, d, tk, DEPTH, 1e-4, S, 3, True, False, None, True, True))
    assert np.isnan(starved).all()
    # Gradients through a strict starved program are NaN (loud), not biased.
    g = jax.grad(lambda sc: jnp.mean(trace_recorded_persist(
        sc, o, d, tk, DEPTH, 1e-4, S, 3, True, False, None, True,
        True) ** 2), allow_int=True)(scene)
    assert np.isnan(np.asarray(g.albedo)).all()
    # A loss LINEAR in radiance has constant cotangents — the primal
    # poison alone never reaches jax.grad's output (the NaN primal is
    # discarded), so the backward must poison its own outputs (round-4
    # review finding; previously returned finite biased gradients here).
    g_lin = jax.grad(lambda sc: jnp.sum(trace_recorded_persist(
        sc, o, d, tk, DEPTH, 1e-4, S, 3, True, False, None, True,
        True)), allow_int=True)(scene)
    assert np.isnan(np.asarray(g_lin.albedo)).all()
    # Zero drops: strict is bitwise-free.
    ok_strict = np.asarray(trace_recorded_persist(
        scene, o, d, tk, DEPTH, 1e-4, S, None, True, False, None, True, True))
    ok_plain = np.asarray(trace_recorded_persist(
        scene, o, d, tk, DEPTH, 1e-4, S, None, True))
    np.testing.assert_array_equal(ok_strict, ok_plain)
    # ...and the strict backward stays finite when nothing is dropped.
    g_ok = jax.grad(lambda sc: jnp.sum(trace_recorded_persist(
        sc, o, d, tk, DEPTH, 1e-4, S, None, True, False, None, True,
        True)), allow_int=True)(scene)
    assert np.isfinite(np.asarray(g_ok.albedo)).all()


def test_dropped_audit_excludes_padding_dummies():
    """Padding dummies (one-iteration sky rays, output sliced off) must not
    count as dropped paths: an all-miss scene whose real rays all fit in
    strip 0 completes them in the first iteration, so a cap of n_iters=1
    drops ZERO real paths even though strips 1..S-1 are full of dummies —
    the audit must say 0 and strict must NOT poison the (exact) render
    (round-4 review: the old accounting counted every unstarted dummy
    strip, poisoning exact renders)."""
    scene = make_scene([lambertian((0, -500, 0), 1.0, (0.5, 0.5, 0.5))],
                       pad_to=1)
    R = 594  # << one strip width after block padding -> strips 1..3 dummy
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (R, 1))
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (R, 1))
    tk = jax.random.PRNGKey(0)
    dropped = int(persist_dropped_paths(scene, o, d, tk, 4, 1e-4, 4, 1,
                                        True))
    assert dropped == 0, dropped
    rad = np.asarray(trace_recorded_persist(scene, o, d, tk, 4, 1e-4, 4, 1,
                                            True, False, None, True, True))
    assert np.isfinite(rad).all()  # strict does not poison an exact render
    # Sanity: a cap that DOES drop real paths still reports them — two
    # real rays per lane (second strip real), cap 1 freezes the second.
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _strip_geometry)
    rows, Wl = _strip_geometry(R, 4)
    R2 = Wl + 97  # 97 real rays land in strip 1
    o2 = jnp.tile(o[:1], (R2, 1))
    d2 = jnp.tile(d[:1], (R2, 1))
    dropped2 = int(persist_dropped_paths(scene, o2, d2, tk, 4, 1e-4, 4, 1,
                                         True))
    assert dropped2 == 97, dropped2


def test_resolve_grad_path_sets_strict_on_auto_default():
    from raytracingweekend_jl_tpu.grad import resolve_grad_path
    kw = resolve_grad_path({}, 1 << 21, "tpu")
    assert kw["recorded_persist"] == (8, None, (44, 16))
    assert kw["persist_strict"] is True
    # Explicit configs keep the documented bias-low overflow contract.
    kw2 = resolve_grad_path({"recorded_persist": (8, None, (44, 16))},
                            1 << 21, "tpu")
    assert "persist_strict" not in kw2


def test_persist_vjp_matches_twin_autodiff():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    g_out = jax.random.normal(jax.random.PRNGKey(0), (o.shape[0], 3),
                              jnp.float32)

    def loss_persist(sc, oo, dd):
        return jnp.vdot(trace_recorded_persist(sc, oo, dd, tk, DEPTH, 1e-4,
                                               S, None, True), g_out)

    def loss_twin(sc, oo, dd):
        return jnp.vdot(twin_persist(sc, oo, dd, tk), g_out)

    gs_f, go_f, gd_f = jax.grad(loss_persist, argnums=(0, 1, 2),
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
    # Direction cotangents: compare tangentially (same gauge freedom as the
    # fixed-depth suite — the implicit-t form differs from autodiff-through-
    # the-quadratic by a component ALONG d that normalize() projects out).
    dn = np.asarray(d)
    proj = lambda g: g - (np.sum(g * dn, -1, keepdims=True)) * dn
    a, b = proj(np.asarray(gd_f)), proj(np.asarray(gd_t))
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="direction (tangential)")


def test_persist_fd_self_consistency_albedo():
    scene = mixed_scene()
    o, d, tk = rays_for(scene)

    def loss(sc):
        r = trace_recorded_persist(sc, o, d, tk, DEPTH, 1e-4, S, None, True)
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


def test_persist_mat_and_key_not_differentiated():
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=16, H=9)

    def loss(sc):
        return jnp.sum(trace_recorded_persist(sc, o, d, tk, 4, 1e-4, S,
                                              None, True))

    g = jax.grad(loss, allow_int=True)(scene)
    assert g.mat.dtype == jax.dtypes.float0


# ---------------------------------------------------------------------------
# Multi-strip refill: R > min strip width so lanes actually regenerate
# ---------------------------------------------------------------------------
# The small-geometry tests above pad to one 8192-lane strip (R=576), so no
# lane refills and the regen/deposit/reset machinery is idle. 128x72 = 9216
# rays with S=2 puts a second ray on lanes 0-1023: strip refill, the replay
# chain cut, the strip-selected radiance gradient, and the ray-gradient
# deposit all fire on those lanes.


def test_persist_multistrip_forward_and_vjp():
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=128, H=72)
    S2 = 2
    out = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                            S2, None, True))
    ref = np.asarray(twin_persist(scene, o, d, tk, n_strips=S2))
    assert np.isfinite(out).all()
    # A handful of grazing-hit lanes may diverge chaotically under f32
    # op-ordering (interpret-mode fusion vs the flat twin flips a hit, the
    # whole downstream path re-deals) — same divergence class the intersect
    # suite documents. Require per-ray agreement elsewhere + matched energy.
    diverged = np.abs(out - ref).max(axis=-1) > 1e-3
    assert diverged.mean() < 1e-3, diverged.mean()
    np.testing.assert_allclose(out[~diverged], ref[~diverged],
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out.mean(), ref.mean(), atol=1e-4)

    # Sanity that the refill actually happened: lanes 0-1023 carry strip-1
    # rays, whose radiance must be non-trivial (not all black).
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _strip_geometry)
    _, W_l = _strip_geometry(o.shape[0], S2)
    assert o.shape[0] > W_l, "geometry regression: no refill exercised"
    assert np.abs(out[W_l:]).sum() > 0

    # Zero the diverged rays' loss weights: their paths differ between the
    # two programs, so their adjoints are incomparable; every other ray's
    # path is identical and must produce matching gradients.
    g_out = jax.random.normal(jax.random.PRNGKey(0), (o.shape[0], 3),
                              jnp.float32)
    g_out = g_out * (~diverged)[:, None]

    def loss_persist(sc, oo, dd):
        return jnp.vdot(trace_recorded_persist(sc, oo, dd, tk, DEPTH, 1e-4,
                                               S2, None, True), g_out)

    def loss_twin(sc, oo, dd):
        return jnp.vdot(twin_persist(sc, oo, dd, tk, n_strips=S2), g_out)

    gs_f, go_f, gd_f = jax.grad(loss_persist, argnums=(0, 1, 2),
                                allow_int=True)(scene, o, d)
    gs_t, go_t, gd_t = jax.grad(loss_twin, argnums=(0, 1, 2),
                                allow_int=True)(scene, o, d)

    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a = np.asarray(getattr(gs_f, f))
        b = np.asarray(getattr(gs_t, f))
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale, err_msg=f)
    # Ray gradients on the REFILLED strip (deposits) and strip 0 (final
    # carried cotangent) both match autodiff.
    a, b = np.asarray(go_f), np.asarray(go_t)
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="origin")
    assert np.abs(b[W_l:]).sum() > 0, "strip-1 origin grads all zero"
    dn = np.asarray(d)
    proj = lambda g: g - (np.sum(g * dn, -1, keepdims=True)) * dn
    a, b = proj(np.asarray(gd_f)), proj(np.asarray(gd_t))
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=1e-5 + 2e-3 * scale,
                               err_msg="direction (tangential)")


def test_persist_fused_step_matches_unfused():
    # The single-dispatch record kernel (in-kernel sweep + winner-attribute
    # running select) must reproduce the 3-dispatch path: same draws, same
    # closed forms — agreement up to grazing-hit divergence, plus FD
    # self-consistency of its own VJP.
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    a = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                          S, None, True, False))
    b = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                          S, None, True, True))
    div = np.abs(a - b).max(-1) > 1e-3
    assert div.mean() < 1e-3
    np.testing.assert_allclose(a[~div], b[~div], atol=2e-4, rtol=1e-4)

    def loss(sc):
        return jnp.mean(trace_recorded_persist(
            sc, o, d, tk, DEPTH, 1e-4, S, None, True, True) ** 2)

    g = jax.grad(loss, allow_int=True)(scene)
    g_ad = float(np.asarray(g.albedo)[0, 0])

    def loss_at(dl):
        arr = np.asarray(scene.albedo).copy()
        arr[0, 0] += dl
        return float(loss(scene._replace(albedo=jnp.asarray(arr))))

    eps = 1e-2
    g_fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    np.testing.assert_allclose(g_ad, g_fd, rtol=3e-2, atol=1e-6)


# ---------------------------------------------------------------------------
# Tail compaction: phase-2 gather boundary
# ---------------------------------------------------------------------------

def twin_persist_tc(scene, origin, direction, key, b1, wdiv,
                    max_depth=DEPTH, n_strips=2, n_iters=None, tmin=1e-4):
    """Twin of the tail-compacted persistent forward: phase 1 at full width
    for b1 iterations, then a survivor gather into W/wdiv lanes and phase 2
    with ABSOLUTE-iteration uniform keys (matching the kernel driver)."""
    from raytracingweekend_jl_tpu.ops.pallas.shade_kernel import SHADE_ROWS
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    R = origin.shape[0]
    rows, W = _strip_geometry(R, n_strips)
    delta = _strip_delta(W)
    rows2 = max(rows // wdiv, SHADE_ROWS)
    W2 = rows2 * LANES
    amat = _attr_mat(scene)
    f32 = jnp.float32

    def strips(x, dummy):
        xp = jnp.concatenate(
            [x.astype(f32),
             jnp.broadcast_to(jnp.asarray(dummy, f32),
                              (n_strips * W - R, 3))]).reshape(n_strips, W, 3)
        return jnp.stack([jnp.roll(xp[c], -c * delta, axis=0)
                          for c in range(n_strips)])

    so = strips(origin, (0.0, -1e7, 0.0))
    sd = strips(direction, (0.0, -1.0, 0.0))
    rad = jnp.zeros((n_strips, W, 3), f32)

    def run_phase(o, d, thr, bo, sp, act, so_p, sd_p, i0, cap, width, rws):
        banks = []  # (strip-onehot mask [Wp], bank [Wp,3]) per iteration
        for i in range(i0, cap):
            res = intersect_spheres(o, d, scene, tmin=tmin)
            t = jnp.where(res.hit & act, res.t, jnp.float32(BIG)).astype(f32)
            attrs10 = amat[res.index]
            u5 = _u5_for(key, i, rws).reshape(5, -1)
            attrs_vals = tuple(attrs10[:, j] for j in range(10))
            zf = jnp.zeros((width,), f32)
            (bkr, bkg, bkb, hitm, miss, px, py, pz, ndx, ndy, ndz,
             aar, aag, aab) = _shade_core(
                u5, t, attrs_vals, o[:, 0], o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2], thr[:, 0], thr[:, 1], thr[:, 2],
                zf, zf, zf, act)
            newb = bo + 1
            cont = hitm & (newb < max_depth)
            term = miss | (hitm & ~cont)
            nxt_s = sp + 1
            can = term & (nxt_s < n_strips)
            banks.append((miss, sp, jnp.stack([bkr, bkg, bkb], -1)))
            hf = cont.astype(f32)[:, None]
            o = hf * jnp.stack([px, py, pz], -1) + (1 - hf) * o
            d = hf * jnp.stack([ndx, ndy, ndz], -1) + (1 - hf) * d
            thr = jnp.where(cont[:, None],
                            thr * jnp.stack([aar, aag, aab], -1), thr)
            bo = jnp.where(cont, newb, bo)
            for c in range(1, n_strips):
                selc = (can & (nxt_s == c))[:, None]
                o = jnp.where(selc, so_p[c], o)
                d = jnp.where(selc, sd_p[c], d)
            thr = jnp.where(can[:, None], 1.0, thr)
            bo = jnp.where(can, 0, bo)
            sp = jnp.where(can, nxt_s, sp)
            act = (act & ~term) | can
        return o, d, thr, bo, sp, act, banks

    lane = jnp.arange(W, dtype=jnp.int32)
    o, d = so[0], sd[0]
    thr = jnp.ones((W, 3), f32)
    bo = jnp.zeros((W,), jnp.int32)
    sp = jnp.zeros((W,), jnp.int32)
    act = jnp.ones((W,), bool)
    o, d, thr, bo, sp, act, banks1 = run_phase(
        o, d, thr, bo, sp, act, so, sd, 0, b1, W, rows)

    sel = jnp.nonzero(act, size=W2, fill_value=0)[0]
    valid2 = jnp.arange(W2) < jnp.sum(act)
    o2, d2, thr2 = o[sel], d[sel], thr[sel]
    bo2, sp2 = bo[sel], sp[sel]
    act2 = act[sel] & valid2
    so2 = so[:, sel]
    sd2 = sd[:, sel]
    o2, d2, thr2, bo2, sp2, act2, banks2 = run_phase(
        o2, d2, thr2, bo2, sp2, act2, so2, sd2, b1, n_iters, W2, rows2)

    for miss, spb, bank in banks1:
        for c in range(n_strips):
            m = (miss & (spb == c))[:, None]
            rad = rad.at[c].set(jnp.where(m, bank, rad[c]))
    for miss, spb, bank in banks2:
        for c in range(n_strips):
            m = (miss & (spb == c) & valid2)[:, None]
            rad = rad.at[c, sel].add(jnp.where(m, bank, 0.0))
    rad = jnp.stack([jnp.roll(rad[c], c * delta, axis=0)
                     for c in range(n_strips)])
    return rad.reshape(n_strips * W, 3)[:R]


def test_persist_tail_compact_matches_twin():
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=128, H=72)
    S2, B1, WDIV = 2, 6, 4
    out = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                            S2, None, True, False, (B1, WDIV)))
    ref = np.asarray(twin_persist_tc(scene, o, d, tk, B1, WDIV))
    assert np.isfinite(out).all()
    diverged = np.abs(out - ref).max(axis=-1) > 1e-3
    assert diverged.mean() < 1e-3, diverged.mean()
    np.testing.assert_allclose(out[~diverged], ref[~diverged],
                               atol=2e-4, rtol=1e-4)
    assert int(persist_dropped_paths(scene, o, d, tk, DEPTH, 1e-4, S2, None,
                                     True, False, (B1, WDIV))) == 0

    g_out = jax.random.normal(jax.random.PRNGKey(0), (o.shape[0], 3),
                              jnp.float32)
    g_out = g_out * (~diverged)[:, None]

    def loss_k(sc, oo, dd):
        return jnp.vdot(trace_recorded_persist(
            sc, oo, dd, tk, DEPTH, 1e-4, S2, None, True, False,
            (B1, WDIV)), g_out)

    def loss_t(sc, oo, dd):
        return jnp.vdot(twin_persist_tc(sc, oo, dd, tk, B1, WDIV), g_out)

    gs_f, go_f, gd_f = jax.grad(loss_k, argnums=(0, 1, 2),
                                allow_int=True)(scene, o, d)
    gs_t, go_t, gd_t = jax.grad(loss_t, argnums=(0, 1, 2),
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


def test_persist_tail_compact_nonaligned_rows():
    # Regression: rows // wdiv that is not a whole number of kernel blocks
    # (here 192 // 2 = 96 rows vs 64-row blocks) used to leave the
    # remainder rows OUTSIDE the phase-2 grid — unwritten memory fed the
    # replay and gradients exploded (caught on device at S=12: albedo grad
    # sum 1.96e5 instead of -0.048). The fix rounds phase-2 rows up to
    # whole blocks.
    scene = mixed_scene()
    o, d, tk = rays_for(scene, W=320, H=180)
    S3, TC = 3, (6, 2)
    out = np.asarray(trace_recorded_persist(scene, o, d, tk, DEPTH, 1e-4,
                                            S3, None, True, False, TC))
    assert np.isfinite(out).all() and float(np.abs(out).max()) < 10.0
    assert int(persist_dropped_paths(scene, o, d, tk, DEPTH, 1e-4, S3,
                                     None, True, False, TC)) == 0

    def loss(sc):
        return jnp.mean(trace_recorded_persist(
            sc, o, d, tk, DEPTH, 1e-4, S3, None, True, False, TC) ** 2)

    g = jax.grad(loss, allow_int=True)(scene)
    g_ad = float(np.asarray(g.albedo)[0, 0])
    assert abs(g_ad) < 1.0, g_ad  # exploded gradients were ~1e5

    def loss_at(dl):
        arr = np.asarray(scene.albedo).copy()
        arr[0, 0] += dl
        return float(loss(scene._replace(albedo=jnp.asarray(arr))))

    eps = 1e-2
    g_fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    np.testing.assert_allclose(g_ad, g_fd, rtol=3e-2, atol=1e-6)


def test_persist_rec_attrs_off_bitwise_equal(monkeypatch):
    """rec_attrs=False (11-slice record, replay refetches winner attributes
    from the recorded indices) must reproduce the default path's loss AND
    gradients bitwise — the refetch is the identical gather the record
    phase used. Covers both the plain and tail-compacted drivers. Pin the
    loop replay on both sides: the fused whole-phase replay (default since
    round 4) requires the 21-slice record, so the lean side falls back to
    the loop and the two would differ by f32 accumulation order."""
    monkeypatch.setenv("RTW_REPLAY_FUSED", "0")
    scene = mixed_scene()
    o, d, tk = rays_for(scene)

    for tc in (None, (6, 2)):
        def loss(sc, rec_attrs, tc=tc):
            r = trace_recorded_persist(sc, o, d, tk, DEPTH, 1e-4, S, None,
                                       True, False, tc, rec_attrs)
            return jnp.mean(r * r)

        l_on, g_on = jax.value_and_grad(
            lambda sc: loss(sc, True), allow_int=True)(scene)
        l_off, g_off = jax.value_and_grad(
            lambda sc: loss(sc, False), allow_int=True)(scene)
        assert float(l_on) == float(l_off), tc
        for f in ("center", "radius", "albedo", "fuzz", "ir"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g_on, f)), np.asarray(getattr(g_off, f)),
                err_msg=f"{f} tc={tc}")


def test_persist_replay_fused_matches_loop(monkeypatch):
    """RTW_REPLAY_FUSED=1 (whole-phase fused replay: one pallas_call per
    phase, slot axis in-grid, carries resident) must reproduce the
    per-iteration loop replay: identical loss (same forward), BITWISE ray
    gradients (identical per-lane op sequence), and scene gradients equal
    up to f32 accumulation order in the flattened dattr contraction.
    Covers plain, tail-compacted, and multi-strip drivers."""
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    g_out = jax.random.normal(jax.random.PRNGKey(3), (o.shape[0], 3),
                              jnp.float32)

    for n_strips, tc in ((S, None), (S, (6, 2)), (2, (5, 2))):
        def loss(sc, oo, dd, tc=tc, n_strips=n_strips):
            r = trace_recorded_persist(sc, oo, dd, tk, DEPTH, 1e-4,
                                       n_strips, None, True, False, tc)
            return jnp.vdot(r, g_out)

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                     allow_int=True)
        monkeypatch.delenv("RTW_REPLAY_FUSED", raising=False)
        l_loop, (gs_l, go_l, gd_l) = grad_fn(scene, o, d)
        monkeypatch.setenv("RTW_REPLAY_FUSED", "1")
        l_fused, (gs_f, go_f, gd_f) = jax.value_and_grad(
            loss, argnums=(0, 1, 2), allow_int=True)(scene, o, d)

        assert float(l_loop) == float(l_fused), (n_strips, tc)
        np.testing.assert_array_equal(np.asarray(go_l), np.asarray(go_f),
                                      err_msg=f"origin tc={tc}")
        np.testing.assert_array_equal(np.asarray(gd_l), np.asarray(gd_f),
                                      err_msg=f"direction tc={tc}")
        for f in ("center", "radius", "albedo", "fuzz", "ir"):
            a, b = np.asarray(getattr(gs_l, f)), np.asarray(getattr(gs_f, f))
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(
                b, a, atol=1e-6 + 1e-5 * scale,
                err_msg=f"{f} n_strips={n_strips} tc={tc}")


def test_persist_dattr_group_remainder(monkeypatch):
    """The grouped dattr contraction (static G-slot dots) must equal the
    per-slot scan for a G that does NOT divide the slot count — the final
    short group exercises the Python-slice remainder path. Same math,
    different f32 accumulation order -> tight allclose."""
    from raytracingweekend_jl_tpu.ops.pallas import persist_grad_kernel as pgk
    scene = mixed_scene()
    o, d, tk = rays_for(scene)
    g_out = jax.random.normal(jax.random.PRNGKey(5), (o.shape[0], 3),
                              jnp.float32)
    monkeypatch.setenv("RTW_REPLAY_FUSED", "1")

    def loss(sc, oo, dd):
        r = trace_recorded_persist(sc, oo, dd, tk, DEPTH, 1e-4,
                                   S, None, True)
        return jnp.vdot(r, g_out)

    grads = {}
    for G in (1, 3):
        monkeypatch.setattr(pgk, "_DATTR_GROUP", G)
        jax.clear_caches()
        _, (gs, _, _) = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                           allow_int=True)(scene, o, d)
        grads[G] = gs
    n_slots = default_n_iters(S, DEPTH)
    assert n_slots % 3 != 0, "pick a non-dividing G for this test"
    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a = np.asarray(getattr(grads[1], f))
        b = np.asarray(getattr(grads[3], f))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=1e-6 + 1e-5 * scale,
                                   err_msg=f)


def test_persist_replay_fused_lean_falls_back(monkeypatch):
    """rec_attrs=False has no 21-slice record; the fused switch must fall
    back to the loop replay and stay bitwise-equal to the default."""
    scene = mixed_scene()
    o, d, tk = rays_for(scene)

    def loss(sc, rec_attrs):
        r = trace_recorded_persist(sc, o, d, tk, DEPTH, 1e-4, S, None,
                                   True, False, (6, 2), rec_attrs)
        return jnp.mean(r * r)

    monkeypatch.setenv("RTW_REPLAY_FUSED", "1")
    l_on, g_on = jax.value_and_grad(
        lambda sc: loss(sc, True), allow_int=True)(scene)
    l_off, g_off = jax.value_and_grad(
        lambda sc: loss(sc, False), allow_int=True)(scene)
    assert float(l_on) == float(l_off)
    for f in ("center", "radius", "albedo", "fuzz", "ir"):
        a, b = np.asarray(getattr(g_on, f)), np.asarray(getattr(g_off, f))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=1e-6 + 1e-5 * scale, err_msg=f)


def test_persist_record_bytes_accounting():
    """The exact footprint helper must price the real buffer shapes: 21 (or
    11) record planes + the index plane per slice at each phase's padded
    width."""
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        persist_record_bytes, _persist_block_rows)
    R = 1920 * 1080
    rows, W = _strip_geometry(R, 8)
    cap = default_n_iters(8, 16)
    plain = persist_record_bytes(R, 8, None, None, 16)
    assert plain == cap * (rows * LANES * 22 * 4 + 4)
    b1, wdiv = 44, 16
    br2 = _persist_block_rows(8)
    rows2 = -(-max(rows // wdiv, br2) // br2) * br2
    tc = persist_record_bytes(R, 8, None, (b1, wdiv), 16)
    expected = (b1 * (rows * LANES * 22 * 4 + 4)
                + (cap - b1) * (rows2 * LANES * 22 * 4 + 4)
                + 2 * rows2 * LANES * 4)
    assert tc == expected
    # Dropping the attr planes halves the dominant term.
    lean = persist_record_bytes(R, 8, None, (b1, wdiv), 16, rec_attrs=False)
    assert lean < 0.6 * tc


def test_hwprng_branches_trace(monkeypatch):
    """Abstractly trace (jax.eval_shape — no compile, no execute) the
    HARDWARE-PRNG kernel branches that interpret-mode tests never enter.
    Pallas traces kernel bodies at jaxpr-build time, so a Python-level
    fault inside the hw_prng branch (the round-4 _BLOCK_SEED_STRIDE
    NameError shipped exactly there) is caught on CPU without a TPU."""
    scene = mixed_scene()
    cam = default_camera()
    u, v = pixel_coords(64, 36)
    key = jax.random.PRNGKey(2)
    o, d = get_rays(cam, u, v, rngmod.purpose_key(key, rngmod.LENS))
    tk = rngmod.purpose_key(key, rngmod.SCATTER_DIR)
    params = (scene.center, scene.radius, scene.albedo)

    def loss_for(**kw):
        def loss(p):
            sc = scene._replace(center=p[0], radius=p[1], albedo=p[2])
            r = trace_recorded_persist(sc, o, d, tk, 6, 1e-4, 4, None,
                                       False,  # interpret=False => hw PRNG
                                       kw.get("fused_step", False),
                                       kw.get("tail_compact"),
                                       kw.get("rec_attrs", True))
            return jnp.mean(r * r)
        return loss

    for env in ("0", "1"):  # loop replay and fused whole-phase replay
        monkeypatch.setenv("RTW_REPLAY_FUSED", env)
        for kw in ({}, {"tail_compact": (3, 2)}, {"rec_attrs": False},
                   {"fused_step": True}):
            jax.eval_shape(jax.grad(loss_for(**kw)), params)
