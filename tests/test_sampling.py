"""Distribution tests for the branch-free samplers (replacing the reference's
rejection loops, src/rand.jl:15-22,31-38)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracingweekend_jl_tpu import unit_sphere_directions, unit_disk_points, uniform_between


def test_unit_sphere_norm_and_mean():
    u = np.asarray(unit_sphere_directions(jax.random.PRNGKey(0), (20000,)))
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-5)
    # Uniform on the sphere → zero mean, component variance 1/3.
    assert np.all(np.abs(u.mean(0)) < 0.02)
    np.testing.assert_allclose((u ** 2).mean(0), 1 / 3, atol=0.02)


def test_unit_disk_inside_and_uniform():
    p = np.asarray(unit_disk_points(jax.random.PRNGKey(1), (20000,)))
    r2 = (p ** 2).sum(-1)
    assert np.all(r2 <= 1.0 + 1e-6)
    # Uniform in disk → E[r^2] = 1/2, zero mean.
    assert abs(r2.mean() - 0.5) < 0.02
    assert np.all(np.abs(p.mean(0)) < 0.02)
    # Angle uniformity: quadrant counts roughly equal.
    quad = (p[:, 0] > 0).astype(int) * 2 + (p[:, 1] > 0).astype(int)
    counts = np.bincount(quad, minlength=4) / len(p)
    np.testing.assert_allclose(counts, 0.25, atol=0.02)


def test_uniform_between():
    x = np.asarray(uniform_between(jax.random.PRNGKey(2), (10000,), 0.5, 1.0))
    assert x.min() >= 0.5 and x.max() < 1.0
    assert abs(x.mean() - 0.75) < 0.01


def test_determinism():
    a = unit_sphere_directions(jax.random.PRNGKey(7), (16,))
    b = unit_sphere_directions(jax.random.PRNGKey(7), (16,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
