"""Wavefront path integrator.

The reference's ``ray_color`` is a *recursive* per-ray function: miss → sky,
hit → scatter and recurse with multiplied attenuation, depth 16 then black
(reference: src/ray_color.jl:14-38). Recursion is hostile to XLA; the
TPU-native integrator is the standard wavefront rewrite: a ``lax.fori_loop``
over bounces carrying SoA per-ray state
``(origin, direction, throughput, radiance, alive)`` with masked updates:

    miss  : radiance += throughput * skycolor(dir); alive = False
    hit   : throughput *= attenuation; (origin, dir) = scatter(...)
    depth : after ``max_depth`` scatters surviving rays contribute black,
            exactly like the reference's ``depth <= 0 -> black`` base case.

Equivalence argument: unrolling the reference recursion gives
``color = (prod of attenuations until first miss) * sky``, or 0 if no miss
within ``max_depth`` scatters — precisely what the loop accumulates.

For reverse-mode AD the loop body is wrapped in ``jax.checkpoint`` so the
backward sweep rematerialises per-bounce state instead of stashing all 16
bounce frontiers in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene import Scene
from .intersect import intersect_spheres, DEFAULT_TMIN, BIG
from .materials import scatter

#: Reference default bounce depth (src/ray_color.jl:14); 4 is insufficient for
#: hollow glass (README.md:208-210).
DEFAULT_MAX_DEPTH = 16

_WHITE = (1.0, 1.0, 1.0)
_SKYBLUE = (0.5, 0.7, 1.0)


def skycolor(direction: jnp.ndarray) -> jnp.ndarray:
    """Vertical white→skyblue lerp on dir.y (reference: src/ray_color.jl:1-6)."""
    dtype = direction.dtype
    t = 0.5 * (direction[..., 1] + 1.0)
    white = jnp.asarray(_WHITE, dtype)
    skyblue = jnp.asarray(_SKYBLUE, dtype)
    return (1.0 - t)[..., None] * white + t[..., None] * skyblue


@partial(jax.jit, static_argnames=("max_depth", "tmin", "remat"))
def trace(scene: Scene, origin: jnp.ndarray, direction: jnp.ndarray,
          key: jax.Array, max_depth: int = DEFAULT_MAX_DEPTH,
          tmin: float = DEFAULT_TMIN, remat: bool = False) -> jnp.ndarray:
    """Trace ``R`` primary rays to radiance ``[R,3]``.

    Args:
      scene: SoA scene pytree (differentiable).
      origin/direction: [R,3] primary rays (directions unit).
      key: per-(chunk) RNG key; bounce b consumes ``fold_in(key, b)``.
      max_depth: maximum scatter events (reference default 16).
      remat: checkpoint the bounce body (use True under ``grad``).
    """
    dtype = origin.dtype
    R = origin.shape[0]

    def body(b, state):
        org, d, thr, rad, alive = state
        res = intersect_spheres(org, d, scene, tmin=tmin)

        # Miss: accumulate sky once, then the ray dies
        # (reference: src/ray_color.jl:35-37).
        miss_now = alive & ~res.hit
        rad = rad + jnp.where(miss_now[..., None], thr * skycolor(d), 0.0)

        # Hit: scatter. Clamp t for non-hitting rays to keep every lane finite
        # (NaN-under-where guard for reverse mode).
        t_safe = jnp.where(res.hit, res.t, jnp.asarray(1.0, dtype))
        s = scatter(scene, org, d, t_safe, res.index, jax.random.fold_in(key, b))

        live_hit = (alive & res.hit)[..., None]
        org = jnp.where(live_hit, s.origin, org)
        d = jnp.where(live_hit, s.direction, d)
        thr = jnp.where(live_hit, thr * s.attenuation, thr)
        alive = alive & res.hit
        return org, d, thr, rad, alive

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    init = (origin, direction,
            jnp.ones((R, 3), dtype),   # throughput
            jnp.zeros((R, 3), dtype),  # radiance
            jnp.ones((R,), dtype=bool))
    _, _, _, radiance, _ = jax.lax.fori_loop(0, max_depth, body, init)
    # Rays still alive after max_depth contribute black
    # (reference: src/ray_color.jl:15-17) — nothing to add.
    return radiance
