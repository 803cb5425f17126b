"""Branch-free random samplers.

The reference draws sphere/disk points by rejection sampling
(reference: src/rand.jl:15-22 ``random_vec3_in_sphere``, :31-38
``random_vec2_in_disk``), which has a data-dependent trip count — a non-starter
under XLA tracing and for autodiff. Each sampler here produces the *same
distribution* in closed form:

- uniform direction on the unit sphere  <- normalised 3-D Gaussian
  (equivalent to the reference's ``random_vec3_on_sphere``, src/rand.jl:29:
  ``normalize(uniform-in-ball)`` is also uniform on the sphere);
- uniform point in the unit disk        <- Shirley's concentric map
  (equivalent distribution to ``random_vec2_in_disk``).

All samplers are shaped, jit-safe, and differentiable w.r.t. nothing (pure
noise) — gradients flow through the *uses* of the samples, never into them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unit_sphere_directions(key: jax.Array, shape: tuple, dtype=jnp.float32) -> jax.Array:
    """``shape + (3,)`` i.i.d. uniform unit vectors (ref: random_vec3_on_sphere, src/rand.jl:29)."""
    g = jax.random.normal(key, shape + (3,), dtype=dtype)
    sq = jnp.sum(g * g, axis=-1, keepdims=True)
    # Guard the measure-zero all-zeros draw.
    return g * jax.lax.rsqrt(jnp.maximum(sq, jnp.asarray(1e-20, dtype)))


def concentric_disk_map(uv: jax.Array) -> jax.Array:
    """Shirley's concentric square->disk map. ``uv`` in [-1,1]^2, trailing axis
    2; returns points uniform in the unit disk when ``uv`` is uniform."""
    dtype = uv.dtype
    a, b = uv[..., 0], uv[..., 1]
    use_a = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(use_a, a, b)
    quarter_pi = jnp.asarray(jnp.pi / 4, dtype)
    half_pi = jnp.asarray(jnp.pi / 2, dtype)
    safe_a = jnp.where(a == 0, 1.0, a).astype(dtype)
    safe_b = jnp.where(b == 0, 1.0, b).astype(dtype)
    theta = jnp.where(use_a, quarter_pi * (b / safe_a), half_pi - quarter_pi * (a / safe_b))
    theta = jnp.where((a == 0) & (b == 0), 0.0, theta)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def unit_disk_points(key: jax.Array, shape: tuple, dtype=jnp.float32) -> jax.Array:
    """``shape + (2,)`` uniform points in the unit disk via the concentric map
    (same distribution as ref random_vec2_in_disk, src/rand.jl:31-38)."""
    u = jax.random.uniform(key, shape + (2,), dtype=dtype, minval=-1.0, maxval=1.0)
    return concentric_disk_map(u)


def per_ray_uniforms(keys: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """``[R, n]`` U[0,1) draws from a batch of per-ray keys (counter-based
    streams — position-independent, see rng.py)."""
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype=dtype))(keys)


def uniform_between(key: jax.Array, shape: tuple, lo, hi, dtype=jnp.float32) -> jax.Array:
    """Uniform in [lo, hi) (ref: random_between, src/rand.jl:24)."""
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)
