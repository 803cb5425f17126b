"""Pallas sweep kernel vs the XLA intersection path (interpret mode on CPU),
plus the analytic custom-VJP against autodiff of the XLA sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import (make_scene, lambertian, scene_random_spheres,
                                      intersect_spheres, t_cam1)
from raytracingweekend_jl_tpu.camera import get_rays
from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
    intersect_spheres_pallas, _sweep)
from raytracingweekend_jl_tpu.render import pixel_coords

KEY = jax.random.PRNGKey(0)


def random_rays(n, seed=0, box=3.0):
    g = np.random.default_rng(seed)
    o = g.uniform(-box, box, (n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_kernel_matches_xla_random_scene():
    scene = scene_random_spheres(seed=1)
    o, d = random_rays(1024, seed=3, box=6.0)
    ref = intersect_spheres(o, d, scene)
    out = intersect_spheres_pallas(o, d, scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.index)[hit],
                                  np.asarray(out.index)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(out.t)[hit],
                               rtol=1e-3, atol=1e-3)


def test_kernel_camera_rays():
    scene = scene_random_spheres(seed=1)
    u, v = pixel_coords(64, 36)
    o, d = get_rays(t_cam1(), u, v, KEY)
    ref = intersect_spheres(o, d, scene)
    out = intersect_spheres_pallas(o, d, scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(out.t)[hit],
                               rtol=1e-3, atol=1e-3)


def test_kernel_nonmultiple_ray_count():
    scene = make_scene([lambertian((0, 0, -1), 0.5, (1, 1, 1))])
    o, d = random_rays(1000, seed=1)  # not a multiple of 128 or 4096
    ref = intersect_spheres(o, d, scene)
    out = intersect_spheres_pallas(o, d, scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(out.hit))


def test_custom_vjp_matches_xla_grads():
    scene = make_scene([
        lambertian((0, 0, -2), 0.6, (1, 1, 1)),
        lambertian((1.5, 0, -3), 0.8, (1, 1, 1)),
    ], pad_to=4)
    o, d = random_rays(256, seed=5, box=1.0)

    def loss_pallas(centers, radius, o, d):
        t, idx = _sweep(o, d, (centers, radius), 1e-4, True)
        return jnp.sum(jnp.where(t < 1e30, t, 0.0))

    def loss_xla(centers, radius, o, d):
        s2 = scene._replace(center=centers, radius=radius)
        res = intersect_spheres(o, d, s2)
        return jnp.sum(jnp.where(res.hit, res.t, 0.0))

    args = (scene.center, scene.radius, o, d)
    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_p[:3], g_x[:3], ("centers", "radius", "origin")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)
    # The direction gradients agree only in the tangent space of the unit
    # sphere: the XLA path freezes a == 1 (valid on |d| = 1) so its d-gradient
    # omits the radial da/dd term, while the implicit-diff backward gives the
    # unconstrained geometric gradient. Both are correct end-to-end because
    # upstream `normalize` projects out the radial component in its VJP.
    dv = np.asarray(d)
    proj = lambda g: g - (np.sum(g * dv, -1, keepdims=True)) * dv
    np.testing.assert_allclose(proj(np.asarray(g_p[3])), proj(np.asarray(g_x[3])),
                               rtol=2e-3, atol=2e-4, err_msg="dir (tangential)")


def test_custom_vjp_finite_diff():
    # Analytic implicit-differentiation backward vs central differences (f64).
    with jax.enable_x64(True):
        centers = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float64)
        radius = jnp.asarray([0.6], jnp.float64)
        o = jnp.asarray([[0.1, -0.2, 0.0]], jnp.float64)
        d_raw = np.array([0.05, 0.02, -1.0])
        d = jnp.asarray([d_raw / np.linalg.norm(d_raw)], jnp.float64)

        # Use the XLA path as the function (same t), grads via the SAME
        # analytic formulas evaluated in f64 through the pallas wrapper is not
        # f64-capable; instead check the f32 analytic grad against f64 FD of
        # the XLA t.
        def t_of(c0z):
            c = centers.at[0, 2].set(c0z)
            s = make_scene([lambertian((0, 0, -2), 0.6, (1, 1, 1))], pad_to=1,
                           dtype=jnp.float64)
            s = s._replace(center=c, radius=radius)
            return float(intersect_spheres(o, d, s).t[0])

        eps = 1e-6
        fd = (t_of(-2.0 + eps) - t_of(-2.0 - eps)) / (2 * eps)

    s32 = make_scene([lambertian((0, 0, -2), 0.6, (1, 1, 1))], pad_to=1)

    def loss(c):
        t, _ = _sweep(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                      (c, s32.radius), 1e-4, True)
        return t[0]

    g = jax.grad(loss)(s32.center)
    np.testing.assert_allclose(float(g[0, 2]), fd, rtol=1e-3)


def test_fused_fetch_matches_separate():
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import intersect_fetch_pallas
    from raytracingweekend_jl_tpu.ops.materials import gather_sphere_attrs
    scene = scene_random_spheres(seed=1)
    o, d = random_rays(512, seed=9, box=6.0)
    ref = intersect_spheres(o, d, scene)
    res, attrs = intersect_fetch_pallas(o, d, scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(res.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.index)[hit],
                                  np.asarray(res.index)[hit])
    want = gather_sphere_attrs(scene, ref.index, jnp.float32)
    names = ("center", "radius", "albedo", "fuzz", "ir", "mat")
    for got, exp, name in zip(attrs, want, names):
        np.testing.assert_allclose(np.asarray(got)[hit], np.asarray(exp)[hit],
                                   atol=1e-6, err_msg=name)


def test_fused_fetch_trace_matches_xla_trace():
    # Full integrator with the fused kernel (interpret) vs the XLA path.
    from raytracingweekend_jl_tpu import trace, scene_4_spheres, t_default_cam
    from raytracingweekend_jl_tpu.camera import get_rays
    from raytracingweekend_jl_tpu.render import pixel_coords
    import raytracingweekend_jl_tpu.ops.integrator as integ

    scene = scene_4_spheres()
    u, v = pixel_coords(48, 27)
    o, d = get_rays(t_default_cam(), u, v, KEY)

    # Monkeypatch-free forcing: interpret-mode pallas via a wrapped intersector.
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import intersect_fetch_pallas
    orig = integ._pick_intersector
    try:
        integ._pick_intersector = lambda up, **kw: (
            lambda org, dd, s, tm: intersect_fetch_pallas(org, dd, s, tmin=tm,
                                                          interpret=True))
        a = np.asarray(trace(scene, o, d, KEY, use_pallas=True))
    finally:
        integ._pick_intersector = orig
    b = np.asarray(trace(scene, o, d, KEY, use_pallas=False))
    # A handful of grazing-hit lanes may diverge chaotically under f32
    # op-ordering differences between the sequential kernel min and XLA's
    # argmin; require per-pixel agreement elsewhere and matched energy.
    mismatch = (np.abs(a - b) > 1e-5).mean()
    assert mismatch < 0.005, mismatch
    np.testing.assert_allclose(a.mean(), b.mean(), atol=1e-4)


def test_fused_fetch_grads():
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import _sweep_fetch
    scene = make_scene([
        lambertian((0, 0, -2), 0.6, (0.3, 0.5, 0.7)),
        lambertian((1.5, 0, -3), 0.8, (0.9, 0.2, 0.1)),
    ], pad_to=4)
    o, d = random_rays(128, seed=11, box=1.0)

    def loss(params):
        out = _sweep_fetch(o, d, params, 1e-4, True)
        t = out[0]
        albedo_r = out[6]
        hit = t < 1e30
        return jnp.sum(jnp.where(hit, t * albedo_r, 0.0))

    params = (scene.center, scene.radius, scene.albedo, scene.fuzz, scene.ir,
              scene.mat.astype(jnp.float32))
    grads = jax.grad(loss)(params)
    for g, name in zip(grads, ("center", "radius", "albedo", "fuzz", "ir", "mat")):
        assert np.isfinite(np.asarray(g)).all(), name
    # Albedo-r grad at sphere 0 = sum of t over rays hitting sphere 0.
    ref = intersect_spheres(o, d, scene)
    hit0 = np.asarray(ref.hit) & (np.asarray(ref.index) == 0)
    expect = np.asarray(ref.t)[hit0].sum()
    np.testing.assert_allclose(float(grads[2][0, 0]), expect, rtol=1e-4)


def test_sweep_masked_matches_sweep():
    """Occupancy-masked sweep == plain sweep on alive lanes; dead BLOCKS
    (block-aligned all-dead regions) return miss sentinels."""
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
        sweep_masked, BLOCK_ROWS, LANES)
    scene = scene_random_spheres(seed=1)
    n = 2 * BLOCK_ROWS * LANES  # two grid blocks
    o, d = random_rays(n, seed=7, box=6.0)
    # Second block entirely dead, first block mixed.
    alive = np.ones(n, dtype=np.int32)
    alive[n // 2:] = 0
    g = np.random.default_rng(9)
    alive[: n // 2] = g.integers(0, 2, n // 2)
    alive = jnp.asarray(alive)

    ref = intersect_spheres(o, d, scene)
    t, idx = sweep_masked(o, d, alive, scene.center, scene.radius, 1e-4,
                          interpret=True)
    t, idx = np.asarray(t), np.asarray(idx)
    # First (mixed) block: full sweep semantics regardless of per-lane alive.
    hit = np.asarray(ref.hit)[: n // 2]
    np.testing.assert_allclose(t[: n // 2][hit], np.asarray(ref.t)[: n // 2][hit],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(idx[: n // 2][hit],
                                  np.asarray(ref.index)[: n // 2][hit])
    # Dead block: sentinel misses.
    assert (t[n // 2:] >= 1e30).all()
    assert (idx[n // 2:] == 0).all()


def test_sweep_masked_planes_matches_flat():
    """The plane-native masked sweep must equal the flat wrapper exactly,
    including when the plane rows are not a whole BLOCK_ROWS multiple
    (remainder rows must be swept, not silently dropped)."""
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
        sweep_masked, sweep_masked_planes, BLOCK_ROWS, LANES)
    scene = scene_random_spheres(seed=1)
    for rows in (2 * BLOCK_ROWS, BLOCK_ROWS + BLOCK_ROWS // 2):
        n = rows * LANES
        o, d = random_rays(n, seed=11, box=6.0)
        alive = jnp.asarray(
            np.random.default_rng(5).integers(0, 2, n).astype(np.int32))
        t_flat, i_flat = sweep_masked(o, d, alive, scene.center, scene.radius,
                                      1e-4, interpret=True)
        o3 = tuple(o[:, j].reshape(rows, LANES) for j in range(3))
        d3 = tuple(d[:, j].reshape(rows, LANES) for j in range(3))
        t_p, i_p = sweep_masked_planes(o3, d3, alive.reshape(rows, LANES),
                                       scene.center, scene.radius, 1e-4,
                                       interpret=True)
        np.testing.assert_array_equal(np.asarray(t_p).reshape(-1),
                                      np.asarray(t_flat))
        np.testing.assert_array_equal(np.asarray(i_p).reshape(-1),
                                      np.asarray(i_flat))
