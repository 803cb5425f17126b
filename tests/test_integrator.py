"""Integrator semantics tests — the wavefront loop must reproduce the
reference's recursive ray_color contract (reference: src/ray_color.jl:14-38)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import (make_scene, lambertian, metal, dielectric,
                                      trace, skycolor, scene_2_spheres)
from raytracingweekend_jl_tpu.ops.materials import scatter
from raytracingweekend_jl_tpu.ops.intersect import intersect_spheres

KEY = jax.random.PRNGKey(0)


def unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def ray(d):
    return (jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([unit(d)], jnp.float32))


def test_all_miss_is_skycolor():
    # Empty scene (padding only) → radiance == skycolor exactly
    # (reference: src/ray_color.jl:35-37).
    scene = make_scene([])
    dirs = np.stack([unit([0, 1, 0]), unit([0, -1, 0]), unit([1, 0.3, -1])])
    o = jnp.zeros((3, 3), jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    rad = np.asarray(trace(scene, o, d, KEY))
    expect = np.asarray(skycolor(d))
    np.testing.assert_allclose(rad, expect, atol=1e-6)
    # Spot-check the lerp itself: dir.y=1 → skyblue, dir.y=-1 → white
    # (reference: src/ray_color.jl:1-6).
    np.testing.assert_allclose(rad[0], [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(rad[1], [1.0, 1.0, 1.0], atol=1e-6)


def test_depth_zero_black():
    scene = make_scene([])
    o, d = ray([0, 0, -1])
    rad = np.asarray(trace(scene, o, d, KEY, max_depth=0))
    np.testing.assert_array_equal(rad, 0.0)


def test_depth_exhaustion_black():
    # Ray trapped hitting a lambertian with max_depth=1: one scatter then the
    # loop ends with the ray alive → black (reference: depth-1 recursion
    # bottoming out at src/ray_color.jl:15-17).
    scene = make_scene([lambertian((0, 0, -1), 0.5, (1.0, 1.0, 1.0))])
    o, d = ray([0, 0, -1])
    rad = np.asarray(trace(scene, o, d, KEY, max_depth=1))
    np.testing.assert_array_equal(rad, 0.0)


def test_perfect_mirror_deterministic():
    # Fuzz-0 metal floor: ray down 45° reflects up 45° into the sky; radiance
    # must equal albedo * skycolor(reflected_dir) exactly (no randomness used
    # in the taken branch).
    albedo = np.array([0.8, 0.6, 0.4])
    center = np.array([0.0, -100.0, 0.0])
    radius = 99.0
    scene = make_scene([metal(center, radius, albedo, 0.0)])
    d_in = unit([1, -1, 0])
    o_np = np.array([0.0, 2.0, 0.0])
    rad = np.asarray(trace(scene, jnp.asarray([o_np], jnp.float32),
                           jnp.asarray([d_in], jnp.float32), KEY))
    # Float64 oracle: quadratic hit, curved-surface normal, mirror reflect,
    # then the sky lerp (reference: src/hit.jl, src/light.jl:6,
    # src/ray_color.jl:1-6).
    oc = o_np - center
    half_b = oc @ d_in
    cc = oc @ oc - radius ** 2
    t_hit = -half_b - np.sqrt(half_b ** 2 - cc)
    p = o_np + t_hit * d_in
    n = (p - center) / radius
    d_out = d_in - 2 * (d_in @ n) * n
    sky_t = 0.5 * (d_out[1] + 1.0)
    sky = (1 - sky_t) * np.array([1.0, 1.0, 1.0]) + sky_t * np.array([0.5, 0.7, 1.0])
    np.testing.assert_allclose(rad[0], albedo * sky, rtol=1e-3)


def test_glass_straight_through():
    # Normal incidence on glass: refraction keeps the direction, ray passes
    # through both surfaces and reaches the sky with attenuation (1,1,1)
    # — unless the Schlick coin reflects; at normal incidence for ir=1.5 the
    # reflectance is 0.04, so with many rays ≥90% go through identically.
    scene = make_scene([dielectric((0, 0, -2), 0.5, 1.5)])
    R = 256
    o = jnp.zeros((R, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (R, 1))
    rad = np.asarray(trace(scene, o, d, KEY))
    sky_fwd = np.asarray(skycolor(d))[0]
    through = np.isclose(rad, sky_fwd, atol=1e-5).all(axis=-1).mean()
    assert through > 0.85, through


def test_lambertian_energy_bounds():
    scene = scene_2_spheres()
    rng = np.random.default_rng(3)
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rad = np.asarray(trace(scene, jnp.zeros((512, 3), jnp.float32),
                           jnp.asarray(d, jnp.float32), KEY))
    assert np.all(rad >= 0.0)
    assert np.all(rad <= 1.0 + 1e-5)  # sky max is 1, albedos < 1
    assert np.isfinite(rad).all()


def test_scatter_normal_orientation():
    # front_face logic: hitting a sphere from outside → normal opposes ray
    # (reference: src/hit.jl:6-10); metal reflection then has positive
    # outgoing component along the normal.
    scene = make_scene([metal((0, 0, -1), 0.5, (1, 1, 1), 0.0)])
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    res = intersect_spheres(o, d, scene)
    s = scatter(scene, o, d, res.t, res.index, KEY)
    np.testing.assert_allclose(np.asarray(s.origin)[0], [0, 0, -0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.direction)[0], [0, 0, 1], atol=1e-5)


def test_trace_remat_matches():
    scene = scene_2_spheres()
    rng = np.random.default_rng(4)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((64, 3), jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    a = np.asarray(trace(scene, o, d, KEY, remat=False))
    b = np.asarray(trace(scene, o, d, KEY, remat=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_onehot_rows_exact_matches_gather():
    # The bf16x3-split one-hot contraction must equal the gather bitwise.
    from raytracingweekend_jl_tpu.ops.materials import _onehot_rows_exact
    from raytracingweekend_jl_tpu import scene_random_spheres
    scene = scene_random_spheres(seed=1)
    attr = jnp.concatenate([scene.center, scene.radius[:, None], scene.albedo,
                            scene.fuzz[:, None], scene.ir[:, None]], axis=1)
    idx = jax.random.randint(jax.random.PRNGKey(0), (4096,), 0, scene.n_spheres)
    rows = _onehot_rows_exact(idx, attr, scene.n_spheres)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(attr)[np.asarray(idx)])


def test_onehot_cols_exact_matches_gather():
    # The flipped (small-M) one-hot fetch must also equal the gather bitwise.
    from raytracingweekend_jl_tpu.ops.materials import _onehot_cols_exact
    from raytracingweekend_jl_tpu import scene_random_spheres
    scene = scene_random_spheres(seed=1)
    attr = jnp.concatenate([scene.center, scene.radius[:, None], scene.albedo,
                            scene.fuzz[:, None], scene.ir[:, None]], axis=1)
    idx = jax.random.randint(jax.random.PRNGKey(0), (4096,), 0, scene.n_spheres)
    cols = _onehot_cols_exact(idx, attr, scene.n_spheres)
    np.testing.assert_array_equal(np.asarray(cols),
                                  np.asarray(attr)[np.asarray(idx)].T)


def test_dattr_contract_flip_matches_row_form():
    # The flipped dattr reduction differs from the row form only in f32
    # accumulation order; on a well-scaled cotangent batch the two must agree
    # to float32 round-off, and the row form must equal a segment-sum oracle.
    from raytracingweekend_jl_tpu.ops.pallas import grad_kernel as gk
    n = 488
    key = jax.random.PRNGKey(3)
    idx = jax.random.randint(key, (8192,), 0, n)
    d9 = jax.random.normal(jax.random.PRNGKey(4), (9, 8192), jnp.float32)
    planes = [d9[j] for j in range(9)]
    flipped = np.asarray(gk._dattr_contract(planes, idx, n))
    rowform = np.asarray(gk._dattr_contract_rowform(planes, idx, n))
    oracle = np.zeros((n, 9), np.float32)
    np.add.at(oracle, np.asarray(idx), np.asarray(d9).T)
    np.testing.assert_allclose(rowform, oracle, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(flipped, rowform, rtol=2e-5, atol=2e-5)


def test_total_internal_reflection():
    # A ray inside glass beyond the critical angle must mirror-reflect
    # deterministically (cannot_refract, reference: src/material.jl:45-48).
    # Unit glass sphere; exit point p=(0,0,1); direction at 60 deg from the
    # outward normal (critical angle for ir=1.5 is ~41.8 deg).
    from raytracingweekend_jl_tpu.ops.materials import scatter as scat
    scene = make_scene([dielectric((0, 0, 0), 1.0, 1.5)])
    n = np.array([0.0, 0.0, 1.0])
    d = np.array([np.sin(np.deg2rad(60.0)), 0.0, np.cos(np.deg2rad(60.0))])
    o = n - 0.9 * d                       # inside the sphere (|o| ~ 0.954)
    o_j = jnp.asarray([o], jnp.float32)
    d_j = jnp.asarray([d], jnp.float32)
    res = intersect_spheres(o_j, d_j, scene)
    assert bool(res.hit[0])
    np.testing.assert_allclose(float(res.t[0]), 0.9, atol=1e-5)
    s_out = scat(scene, o_j, d_j, res.t, res.index, KEY)
    d_out = np.asarray(s_out.direction)[0]
    # TIR is deterministic (no Schlick coin): exact mirror about the normal,
    # outgoing ray stays inside (negative outward component).
    expect = d - 2 * (d @ n) * n
    np.testing.assert_allclose(d_out, expect, atol=1e-5)
    assert d_out @ n < 0
