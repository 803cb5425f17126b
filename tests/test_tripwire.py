"""Gradient sanity tripwire (grad.check_grads_sane / twin_ad_canary).

Round-3 VERDICT weak #3: a grid-alignment bug once produced
grad_albedo_sum=195971 on device and nothing automatic caught it — the row
landed in bench_history.jsonl. These tests pin the tripwire that now guards
every benchmark/session row: deliberately injected corruption must raise,
healthy gradients must pass, and the recorded-vs-remat canary must agree on
a small config.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.grad import (
    GradSanityError, SceneGrads, check_grads_sane, render_grads,
    twin_ad_canary)
from raytracingweekend_jl_tpu.render import render_radiance


def _grads(**overrides):
    g = SceneGrads(center=jnp.zeros((4, 3)), radius=jnp.zeros((4,)),
                   albedo=jnp.full((4, 3), -0.01), fuzz=jnp.zeros((4,)),
                   ir=jnp.zeros((4,)))
    return g._replace(**overrides)


def test_healthy_grads_pass():
    check_grads_sane(_grads(), loss=jnp.float32(0.03))


def test_blown_magnitude_caught():
    # The ts-1787002624 incident value: 195971 in the albedo sum.
    bad = _grads(albedo=jnp.full((4, 3), 195971.64 / 12))
    with pytest.raises(GradSanityError, match="albedo.*implausible"):
        check_grads_sane(bad)


def test_nonfinite_caught():
    bad = _grads(radius=jnp.array([0.0, jnp.nan, 0.0, 0.0]))
    with pytest.raises(GradSanityError, match="radius.*non-finite"):
        check_grads_sane(bad)
    with pytest.raises(GradSanityError, match="loss is not finite"):
        check_grads_sane(_grads(), loss=jnp.float32(jnp.inf))


def test_real_grads_pass_tripwire():
    scene = rtw.scene_4_spheres()
    cam = rtw.t_default_cam()
    target = render_radiance(scene, cam, 64, 1, seed=3)
    bad = scene._replace(albedo=jnp.clip(scene.albedo * 0.7, 0, 1))
    loss, grads = render_grads(bad, cam, target, 64, 2, seed=9)
    check_grads_sane(grads, loss=loss)


def test_injected_kernel_corruption_caught():
    """End-to-end: corrupt the gradients the way a kernel bug would (a
    mis-aligned block writes garbage into one field) and assert the
    tripwire refuses them."""
    scene = rtw.scene_4_spheres()
    cam = rtw.t_default_cam()
    target = render_radiance(scene, cam, 64, 1, seed=3)
    bad = scene._replace(albedo=jnp.clip(scene.albedo * 0.7, 0, 1))
    _, grads = render_grads(bad, cam, target, 64, 2, seed=9)
    corrupted = grads._replace(
        albedo=grads.albedo.at[1].set(jnp.float32(2.0e5)))
    with pytest.raises(GradSanityError):
        check_grads_sane(corrupted)


def test_twin_ad_canary_agrees():
    # CPU backend: the canary compares the default recorded path against
    # the remat XLA transpose at 256-wide; healthy kernels must pass.
    scene = rtw.scene_4_spheres()
    cam = rtw.t_default_cam()
    twin_ad_canary(scene, cam, width=128, n_samples=4)


def test_twin_ad_canary_catches_norm_blowup(monkeypatch):
    """Corrupt one path's output by a huge factor via a monkeypatched
    render_grads and assert the canary trips."""
    import raytracingweekend_jl_tpu.grad as gradmod
    real = gradmod.render_grads
    calls = {"n": 0}

    def poisoned(*a, **k):
        loss, g = real(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1 and k.get("recorded") is not False:
            g = g._replace(albedo=g.albedo * 1e6)
        return loss, g

    monkeypatch.setattr(gradmod, "render_grads", poisoned)
    scene = rtw.scene_4_spheres()
    cam = rtw.t_default_cam()
    with pytest.raises(GradSanityError):
        gradmod.twin_ad_canary(scene, cam, width=128, n_samples=4)
