"""Golden-value unit tests for the vector/light-transport layer.

Values come from the reference's own asserts (reference: test/runtests.jl:180,
203-211 — the refract asserts are active in the notebook,
src/pluto_RayTracingWeekend.jl:603-615).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracingweekend_jl_tpu import (dot, squared_length, near_zero, normalize,
                                      reflect, refract, reflectance, gamma2_encode)


def v(*xs):
    return jnp.asarray(xs, dtype=jnp.float32)


def test_squared_length():
    assert np.isclose(squared_length(v(1.0, 2.0, 3.0)), 14.0)


def test_near_zero():
    assert bool(near_zero(v(1e-3, 1e-3, 1e-3)))
    assert not bool(near_zero(v(0.1, 0.0, 0.0)))


def test_normalize_unit():
    u = normalize(v(1.0, 2.0, 2.0))
    np.testing.assert_allclose(np.asarray(u), [1 / 3, 2 / 3, 2 / 3], atol=1e-6)


def test_normalize_zero_safe():
    # Degenerate input must not produce NaN (grad-safety contract).
    u = normalize(v(0.0, 0.0, 0.0))
    assert np.all(np.isfinite(np.asarray(u)))


def test_reflect_golden():
    # reference: test/runtests.jl:180
    r = reflect(v(0.6, -0.8, 0.0), v(0.0, 1.0, 0.0))
    np.testing.assert_allclose(np.asarray(r), [0.6, 0.8, 0.0], atol=1e-7)


@pytest.mark.parametrize("ratio,expected", [
    # reference: test/runtests.jl:203-211 (unchanged / wider / narrower angle)
    (1.0, [0.6, -0.8, 0.0]),
    (2.0, [0.87519, -0.483779, 0.0]),
    (0.5, [0.3, -0.953939, 0.0]),
])
def test_refract_golden(ratio, expected):
    out = refract(v(0.6, -0.8, 0.0), v(0.0, 1.0, 0.0), jnp.float32(ratio))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_refract_batched_matches_scalar():
    d = jnp.tile(v(0.6, -0.8, 0.0), (5, 1))
    n = jnp.tile(v(0.0, 1.0, 0.0), (5, 1))
    out = refract(d, n, jnp.full((5,), 2.0, jnp.float32))
    np.testing.assert_allclose(np.asarray(out),
                               np.tile([0.87519, -0.483779, 0.0], (5, 1)), atol=1e-3)


def test_reflectance_schlick():
    # Normal incidence: r0 = ((1-r)/(1+r))^2 (reference: src/light.jl:19-25).
    r = float(reflectance(jnp.float32(1.0), jnp.float32(1.5)))
    assert np.isclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)
    # Grazing incidence → 1.
    r = float(reflectance(jnp.float32(0.0), jnp.float32(1.5)))
    assert np.isclose(r, 1.0, atol=1e-6)


def test_gamma2():
    np.testing.assert_allclose(
        np.asarray(gamma2_encode(v(0.25, 1.0, 0.0))), [0.5, 1.0, 0.0], atol=1e-7)


def test_dot_batched():
    a = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    b = jnp.ones((2, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(dot(a, b)), [3.0, 12.0])


def test_color_vec3_in_rgb():
    # reference: src/ray_color.jl:8 — unit +y maps to (0.5, 1.0, 0.5).
    from raytracingweekend_jl_tpu import color_vec3_in_rgb
    out = np.asarray(color_vec3_in_rgb(v(0.0, 2.0, 0.0)))
    np.testing.assert_allclose(out, [0.5, 1.0, 0.5], atol=1e-6)
