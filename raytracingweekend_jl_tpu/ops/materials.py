"""Fused scatter/shading stage — masked-blend material dispatch.

The reference dispatches ``scatter`` dynamically on the material type of the
hit object (reference: src/material.jl:13-53). With only three material kinds,
the TPU-native form computes all three candidate scatter directions for every
ray with shared random draws and blends by the integer material code — fully
branch-free, vectorised, and differentiable through every continuous quantity
(normals, hit points, albedos, fuzz, Schlick reflectance), with the discrete
choices (material code, reflect-vs-refract coin, front-face flip) detached,
matching the straight-through approach of differentiable ray tracers
(RayTracer.jl, PAPERS.md).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import Scene, LAMBERTIAN, METAL
from .vecmath import (dot, normalize, reflect, refract, reflectance, safe_sqrt,
                      NEAR_ZERO_EPS)
from .sampling import unit_sphere_directions


class ScatterResult(NamedTuple):
    """Batch counterpart of the reference's ``Scatter`` (src/structs.jl:37-44).

    The reference's ``reflected`` flag is always true in book 1
    (SURVEY.md §2.6) so absorption is represented only by depth exhaustion;
    we mirror that by having no absorb flag at all."""

    origin: jnp.ndarray       # [R,3] new ray origins (the hit points)
    direction: jnp.ndarray    # [R,3] new unit ray directions
    attenuation: jnp.ndarray  # [R,3] throughput multiplier


def _per_ray_draws(keys: jax.Array, dtype):
    """Counter-based per-ray randoms from a batch of per-ray keys.

    Each ray's unit-sphere sample and Schlick coin come from its own key
    (derived by the caller from stable coordinates like (slot, sample, bounce))
    so the draws are invariant to where the ray currently sits in the
    wavefront array — the property that makes compaction, persistent
    regeneration, and resharding reproducible (SURVEY.md §2.5's counter-based
    RNG design).
    """
    def one_ray(k):
        kd, kc = jax.random.split(k)
        return jax.random.normal(kd, (3,), dtype=dtype), \
            jax.random.uniform(kc, (), dtype=dtype)

    g, xi = jax.vmap(one_ray)(keys)
    sq = jnp.sum(g * g, axis=-1, keepdims=True)
    u = g * jax.lax.rsqrt(jnp.maximum(sq, jnp.asarray(1e-20, dtype)))
    return u, xi


def slot_keys(key: jax.Array, slots: jnp.ndarray) -> jax.Array:
    """[R] per-ray keys from a base key + slot ids (``fold_in`` per ray)."""
    return jax.vmap(jax.random.fold_in, (None, 0))(key, slots)


def attr_mat(scene) -> jnp.ndarray:
    """THE canonical per-sphere attribute matrix ``[N, 10]`` — column order
    ``center.xyz | radius | albedo.rgb | fuzz | ir | mat`` is a cross-kernel
    ABI shared by the shade kernels' attribute unpack, the record/replay
    adjoint (grad_kernel acx..amt), the fused-record in-kernel select, and
    _fused_bwd's g_attr column slicing. Change it in exactly one place
    (here) or gradients/attributes silently corrupt (round-4 review: four
    drifting inline copies consolidated)."""
    f32 = jnp.float32
    return jnp.concatenate([
        scene.center.astype(f32), scene.radius[:, None].astype(f32),
        scene.albedo.astype(f32), scene.fuzz[:, None].astype(f32),
        scene.ir[:, None].astype(f32), scene.mat[:, None].astype(f32)],
        axis=1)


def gather_sphere_attrs(scene: Scene, index: jnp.ndarray, dtype):
    """Fetch per-ray sphere attributes ``(center, radius, albedo, fuzz, ir, mat)``.

    On TPU, per-ray gathers from the sphere SoA are catastrophically slow
    (~85% of trace time measured at R=717k); the MXU-idiomatic replacement is a
    one-hot [R,N] @ [N,F] contraction. With float32 inputs at HIGHEST matmul
    precision the result is bit-identical to the gather (exactly one nonzero
    partial product per output). CPU keeps the plain gather (fast there, and
    interpreter-friendly).
    """
    if jax.default_backend() == "cpu":
        return (scene.center[index].astype(dtype),
                scene.radius[index].astype(dtype),
                scene.albedo[index].astype(dtype),
                scene.fuzz[index].astype(dtype),
                scene.ir[index].astype(dtype),
                scene.mat[index])

    n = scene.n_spheres
    rows = _onehot_rows_exact(index, attr_mat(scene), n).astype(dtype)
    return (rows[:, 0:3], rows[:, 3], rows[:, 4:7], rows[:, 7], rows[:, 8],
            rows[:, 9].astype(jnp.int32))


def _bf16_split3(x: jnp.ndarray):
    """Exact 3-way bf16 decomposition: hi + mid + lo == x bitwise for f32
    (3x8 mantissa bits >= f32's 24). THE shared primitive behind every
    exact one-hot MXU form — change precision here, nowhere else."""
    hi = x.astype(jnp.bfloat16)
    rem = x - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_rows_exact(index: jnp.ndarray, attr: jnp.ndarray, n: int) -> jnp.ndarray:
    """``attr[index]`` as a single bf16 MXU pass, bit-exact for float32 attrs.

    The one-hot matrix is exact in bfloat16 (entries 0/1); the float32
    attribute matrix is split into three non-overlapping bf16 parts
    (hi + mid + lo == attr exactly, 3x8 mantissa bits >= f32's 24) packed
    side by side so ONE default-precision [R,N]@[N,3F] matmul covers all
    parts; with exactly one nonzero product per output and f32 accumulation
    the recombined rows equal the gather bitwise. This reads the [R,N]
    one-hot once — HIGHEST-precision f32 matmuls read operands three times,
    which dominated the shading stage at flagship wavefront sizes.
    """
    f = attr.shape[1]
    packed = jnp.concatenate(_bf16_split3(attr), axis=1)  # [N, 3F] bf16
    onehot = (index[:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)).astype(jnp.bfloat16)
    rows3 = jnp.dot(onehot, packed, preferred_element_type=jnp.float32)
    return rows3[:, 0:f] + rows3[:, f:2 * f] + rows3[:, 2 * f:3 * f]


def _onehot_cols_exact(index: jnp.ndarray, attr: jnp.ndarray, n: int) -> jnp.ndarray:
    """``attr[index].T`` (shape [F, R]) as one small-M bf16 MXU pass.

    Transposed counterpart of :func:`_onehot_rows_exact` for plane-layout
    consumers (the record/replay kernel drivers): the attribute dim (F ~ 10)
    rides the MXU's M axis — padded to sublanes, not to a 128-wide N tile —
    so the matmul does ~4x less array work at identical exactness (still one
    nonzero partial product per output with f32 accumulation), and each
    ``[F, R]`` output row slices straight into a ``[rows, LANES]`` plane
    with no strided column gather. Used (flip-gated) by every plane-layout
    fetch: the record/replay drivers and the persistent forward loops.
    """
    f = attr.shape[1]
    packed_t = jnp.concatenate(_bf16_split3(attr), axis=1).T  # [3F, N] (tiny)
    onehot_t = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                == index[None, :]).astype(jnp.bfloat16)  # [N, R]
    cols3 = jax.lax.dot_general(packed_t, onehot_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return cols3[0:f] + cols3[f:2 * f] + cols3[2 * f:3 * f]


def fetch_attr_planes(index: jnp.ndarray, attr: jnp.ndarray, n: int) -> jnp.ndarray:
    """Winner-attribute fetch in [F, R] plane-major layout (bit-exact
    gather) — the small-M ``_onehot_cols_exact`` form. The round-3b
    on-device A/B measured the two forms perf-neutral on the full step
    (14.08 vs 14.16 Mpaths/s, within rerun noise) with bit-identical
    outputs, so the structurally cheaper form (attribute dim on the MXU
    M axis, no output transpose) is used unconditionally and the former
    RTW_ONEHOT_NOFLIP trace-time env toggle was removed (ADVICE r3: an
    env read inside traced code is not part of the jit cache key)."""
    return _onehot_cols_exact(index, attr, n)


def scatter(scene: Scene, origin: jnp.ndarray, direction: jnp.ndarray,
            t: jnp.ndarray, index: jnp.ndarray, key: jax.Array,
            ray_keys: jax.Array | None = None,
            attrs: tuple | None = None) -> ScatterResult:
    """Scatter ``R`` rays that hit sphere ``index`` at parameter ``t``.

    Rays that did not hit anything receive well-defined (finite) garbage here;
    the integrator masks them out. ``t`` must already be finite for such rays.

    ``ray_keys``: optional [R] per-ray key batch; when given, randomness is
    keyed per ray (position-independent — required for exact compaction /
    persistent regeneration); when None, draws are positional (one shaped draw
    for the whole batch — cheapest). ``attrs``: optionally pre-fetched
    (center, radius, albedo, fuzz, ir, mat) rows (e.g. from a fused Pallas
    sweep), skipping the one-hot fetch.
    """
    dtype = origin.dtype
    one = jnp.asarray(1.0, dtype)

    # Hit point and outward normal (reference: src/hit.jl:3,32-34).
    p = origin + t[..., None] * direction
    if attrs is None:
        attrs = gather_sphere_attrs(scene, index, dtype)
    center, radius, albedo, fuzz, ir, mat = attrs
    # Signed radius: negative radius flips the outward normal → hollow shells
    # (reference: src/hit.jl:33, src/scenes.jl:35-36).
    inv_r = jnp.where(radius == 0, 0.0, jnp.reciprocal(jnp.where(radius == 0, one, radius)))
    n_out = (p - center) * inv_r[..., None]
    front_face = dot(direction, n_out) < 0                  # (reference: src/hit.jl:7)
    n = jnp.where(front_face[..., None], n_out, -n_out)     # (reference: src/hit.jl:8)

    if ray_keys is None:
        k_dir, k_coin = jax.random.split(key)
        u = unit_sphere_directions(k_dir, t.shape, dtype=dtype)  # shared unit sample
        xi = jax.random.uniform(k_coin, t.shape, dtype=dtype)    # Schlick coin
    else:
        u, xi = _per_ray_draws(ray_keys, dtype)

    # --- Lambertian (reference: src/material.jl:13-23) ---
    lam_raw = n + u
    lam_degenerate = jnp.sum(lam_raw * lam_raw, axis=-1) < NEAR_ZERO_EPS
    lam_dir = jnp.where(lam_degenerate[..., None], n, normalize(lam_raw))

    # --- Metal (reference: src/material.jl:25-34; fuzz NOT clamped) ---
    refl = reflect(direction, n)
    metal_dir = normalize(refl + fuzz[..., None] * u)

    # --- Dielectric (reference: src/material.jl:41-53) ---
    eta_ratio = jnp.where(front_face, jnp.reciprocal(ir), ir)
    cos_theta = jnp.minimum(-dot(direction, n), one)
    sin_theta = safe_sqrt(one - cos_theta * cos_theta)
    cannot_refract = eta_ratio * sin_theta > one
    schlick = reflectance(cos_theta, eta_ratio)
    reflect_choice = cannot_refract | (schlick > xi)
    refr_dir = refract(direction, n, eta_ratio)
    diel_dir = jnp.where(reflect_choice[..., None], refl, refr_dir)

    # --- Masked-blend dispatch (replaces Julia dynamic dispatch, SURVEY.md §1) ---
    new_dir = jnp.where((mat == LAMBERTIAN)[..., None], lam_dir,
                        jnp.where((mat == METAL)[..., None], metal_dir, diel_dir))
    # Dielectric rows store albedo (1,1,1) (src/material.jl:42), so a single
    # attribute fetch covers all three materials.
    return ScatterResult(origin=p, direction=new_dir, attenuation=albedo)
