"""Inverse-rendering training surface (optimize.fit_scene).

The reference has no autodiff (SURVEY.md §2.9); this asserts the hybrid
AD+SPSA fitter actually DESCENDS an image loss and recovers perturbed
parameters — a real optimization trajectory, not a single-step smoke test.
The full-scale on-device trajectory lives in scripts/inverse_render.py and
bench_history.jsonl (inverse_* rows); this is its fast CPU contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.optimize import fit_scene, movable_mask
from raytracingweekend_jl_tpu.render import render_radiance

W, H, SPP = 48, 27, 2


def _perturbed_pair():
    scene_true = rtw.ALL_SCENES["4_spheres"]()
    movable = movable_mask(scene_true)
    k = jax.random.PRNGKey(7)
    jit = np.array(jax.random.uniform(k, scene_true.center.shape,
                                      minval=-0.12, maxval=0.12))
    jit[~movable] = 0.0
    alb = np.asarray(scene_true.albedo).copy()
    alb[movable] = np.clip(alb[movable] * 0.55 + 0.15, 0, 1)
    scene0 = scene_true._replace(
        center=jnp.asarray(np.asarray(scene_true.center) + jit),
        albedo=jnp.asarray(alb))
    return scene_true, scene0, movable


def test_fit_scene_descends_and_recovers():
    scene_true, scene0, movable = _perturbed_pair()
    cam = rtw.t_default_cam()
    tkw = {"recorded": True}
    target = render_radiance(scene_true, cam, W, SPP, image_height=H,
                             seed=0, **tkw)

    res = fit_scene(scene0, cam, target, W, SPP, steps=10, seed=0,
                    render_kwargs=tkw)

    losses = res.losses
    assert all(np.isfinite(losses))
    # Descends to threshold: >= 25% loss reduction in 10 steps, and the
    # trajectory ends at (or within noise of) its minimum — no divergence.
    assert losses[-1] < 0.75 * losses[0], losses
    assert losses[-1] <= min(losses) * 1.15, losses

    # Parameter recovery: albedo error strictly shrinks (exact AD channel).
    a_err0 = np.abs(np.asarray(scene0.albedo
                               - scene_true.albedo))[movable].max()
    a_err1 = np.abs(np.asarray(res.scene.albedo
                               - scene_true.albedo))[movable].max()
    assert a_err1 < 0.8 * a_err0, (a_err0, a_err1)
    # Geometry (SPSA channel) must not diverge.
    c_err0 = np.abs(np.asarray(scene0.center
                               - scene_true.center))[movable].max()
    c_err1 = np.abs(np.asarray(res.scene.center
                               - scene_true.center))[movable].max()
    assert c_err1 < 1.3 * c_err0, (c_err0, c_err1)


def test_fit_scene_keeps_immovable_spheres_fixed():
    scene_true, scene0, movable = _perturbed_pair()
    cam = rtw.t_default_cam()
    target = render_radiance(scene_true, cam, W, SPP, image_height=H, seed=0,
                             recorded=True)
    res = fit_scene(scene0, cam, target, W, SPP, steps=2, seed=0,
                    render_kwargs={"recorded": True})
    np.testing.assert_array_equal(
        np.asarray(res.scene.center)[~movable],
        np.asarray(scene0.center)[~movable])
    np.testing.assert_array_equal(
        np.asarray(res.scene.albedo)[~movable],
        np.asarray(scene0.albedo)[~movable])


def test_fit_scene_scan_descends():
    # The single-dispatch scan fitter must descend like the loop fitter
    # (same estimator; SPSA stream differs — jax.random instead of host
    # numpy).
    import raytracingweekend_jl_tpu as rtw
    from raytracingweekend_jl_tpu.optimize import fit_scene_scan, movable_mask
    from raytracingweekend_jl_tpu.render import render_radiance

    scene = rtw.scene_4_spheres()
    cam = rtw.t_default_cam()
    target = render_radiance(scene, cam, 48, 2, image_height=27, seed=0)
    mov = movable_mask(scene)
    k = jax.random.PRNGKey(7)
    jit = np.array(jax.random.uniform(k, scene.center.shape,
                                      minval=-0.1, maxval=0.1))
    jit[~mov] = 0
    bad = scene._replace(center=jnp.asarray(np.asarray(scene.center) + jit),
                         albedo=jnp.clip(scene.albedo * 0.6 + 0.1, 0, 1))
    res = fit_scene_scan(bad, cam, target, 48, 2, steps=10, seed=0)
    assert len(res.losses) == 10
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < 0.75 * res.losses[0], res.losses


def test_fit_scene_fuzz_channel_descends():
    """lr_fuzz > 0 adds metal fuzz as a third parameter group. Fuzz's
    dominant image effect is REFLECTED-RAY visibility (blurred reflections
    of sphere edges) — a secondary-bounce silhouette term: interior-only
    AD measured a near-zero/wrong-sign fuzz gradient (+3e-4 / -3e-5 vs FD
    +0.003/+0.001 on this probe) and the edge estimator at edge_bounces=1
    likewise, while edge_bounces=2 recovers the FD sign (+0.024/+0.0009).
    So the fuzz fit runs through the eb=2 edge loss; it must shrink the
    perturbation while non-metal fuzz stays put."""
    from raytracingweekend_jl_tpu.scene import METAL
    scene_true = rtw.ALL_SCENES["4_spheres"]()
    movable = movable_mask(scene_true)
    metal_mov = movable & (np.asarray(scene_true.mat) == METAL)
    assert metal_mov.any()
    fz = np.asarray(scene_true.fuzz).copy()
    fz[metal_mov] = np.clip(fz[metal_mov] + 0.35, 0, None)
    scene0 = scene_true._replace(fuzz=jnp.asarray(fz))
    cam = rtw.t_default_cam()
    target = render_radiance(scene_true, cam, W, SPP, image_height=H,
                             seed=0, recorded=True)

    res = fit_scene(scene0, cam, target, W, SPP, steps=12, seed=0,
                    lr_albedo=0.0, lr_center=0.0, lr_fuzz=4e-2,
                    geom="edge",
                    edge_kwargs=dict(sigma=0.06, edge_bounces=2))
    assert all(np.isfinite(res.losses))
    assert res.losses[-1] < res.losses[0], res.losses
    f_err0 = np.abs(np.asarray(scene0.fuzz
                               - scene_true.fuzz))[metal_mov].max()
    f_err1 = np.abs(np.asarray(res.scene.fuzz
                               - scene_true.fuzz))[metal_mov].max()
    assert f_err1 < 0.8 * f_err0, (f_err0, f_err1)
    # non-metal fuzz untouched
    np.testing.assert_array_equal(
        np.asarray(res.scene.fuzz)[~metal_mov],
        np.asarray(scene0.fuzz)[~metal_mov])
