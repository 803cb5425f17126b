"""Pallas TPU kernel: fused closest-hit ray-sphere sweep.

The XLA path (ops/intersect.py) expresses the sweep as broadcast [R,N]
elementwise + argmin and leans on XLA fusion. This kernel removes every [R,N]
intermediate *by construction*: each program instance holds a (BLOCK_ROWS, 128)
tile of ray components in VMEM registers and loops over spheres held in SMEM,
maintaining the running (best_t, best_index) — the reference's shrinking
``closest`` scan (src/hit.jl:38-50) vectorised over 8192 rays per step instead
of per ray.

Differentiability: the forward kernel is wrapped in ``jax.custom_vjp`` whose
backward pass uses *implicit differentiation* of the sphere equation
``|o + t d - c|^2 = r^2`` at the winning sphere — closed-form cotangents

    dt/do = -p/(p.d),  dt/dd = -t p/(p.d),  dt/dc = p/(p.d),  dt/dr = r/(p.d)

with ``p = o + t d - c`` — an O(R) backward with NO sphere sweep at all (the
argmin choice is detached, as in the XLA path). Scene cotangents are
scatter-added over the winning indices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...scene import Scene
from ..intersect import HitResult, DEFAULT_TMIN, BIG

#: Rays per program instance: (BLOCK_ROWS, 128) lanes.
BLOCK_ROWS = 32
LANES = 128
BLOCK = BLOCK_ROWS * LANES


def _sweep_kernel(cx_ref, cy_ref, cz_ref, ck_ref,  # [N] scalar-prefetch SMEM
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # ray tiles
                  t_ref, idx_ref,  # outputs
                  *, n_spheres: int, tmin: float):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    big = jnp.float32(BIG)
    init_t = jnp.full(ox.shape, big, jnp.float32)
    init_i = jnp.zeros(ox.shape, jnp.int32)

    def body(s, carry):
        best_t, best_i = carry
        cxs = cx_ref[s]
        cys = cy_ref[s]
        czs = cz_ref[s]
        cks = ck_ref[s]
        # half-b quadratic with a == 1 (reference: src/hit.jl:12-29), stable
        # |oc|^2 expansion as in ops/intersect.py.
        cd = cxs * dx + cys * dy + czs * dz
        oc = cxs * ox + cys * oy + czs * oz
        hb = od - cd
        c = oo - 2.0 * oc + cks
        disc = hb * hb - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = -hb - sq
        # near root if acceptable, else far root (src/hit.jl:22-27)
        t = jnp.where(r1 >= tmin, r1, -hb + sq)
        ok = (disc > 0) & (t >= tmin) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, s, best_i)
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(0, n_spheres, body, (init_t, init_i))
    t_ref[:] = best_t
    idx_ref[:] = best_i


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows * LANES - x.shape[0]
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(rows, LANES)


@partial(jax.jit, static_argnames=("tmin", "interpret"))
def _sweep_forward(origin, direction, centers, ck, tmin, interpret=False):
    R = origin.shape[0]
    n_spheres = centers.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    grid = rows // BLOCK_ROWS

    ray_planes = [
        _pad_rows(origin[:, 0], rows), _pad_rows(origin[:, 1], rows),
        _pad_rows(origin[:, 2], rows),
        _pad_rows(direction[:, 0], rows), _pad_rows(direction[:, 1], rows),
        _pad_rows(direction[:, 2], rows),
    ]
    sphere_planes = [centers[:, 0], centers[:, 1], centers[:, 2], ck]

    # Index maps under PrefetchScalarGridSpec also receive the scalar refs.
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, *_refs: (i, 0),
                            memory_space=pltpu.VMEM)

    # Sphere SoA rides the scalar-prefetch path: 1-D arrays land in SMEM and
    # are indexed per sphere by the sweep loop (a (1,N) SMEM BlockSpec
    # mis-indexes beyond element 128 on real hardware).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=[ray_spec, ray_spec],
    )

    t, idx = pl.pallas_call(
        partial(_sweep_kernel, n_spheres=n_spheres, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(*sphere_planes, *ray_planes)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sweep(origin, direction, scene_params, tmin, interpret):
    centers, radius = scene_params
    ck = jnp.sum(centers * centers, axis=-1) - radius * radius
    return _sweep_forward(origin, direction, centers, ck, tmin, interpret)


def _sweep_fwd(origin, direction, scene_params, tmin, interpret):
    t, idx = _sweep(origin, direction, scene_params, tmin, interpret)
    return (t, idx), (origin, direction, scene_params, t, idx)


def _sweep_bwd(tmin, interpret, residuals, cotangents):
    origin, direction, (centers, radius), t, idx = residuals
    g_t, _ = cotangents  # idx is integer — no cotangent

    hit = t < BIG
    t_safe = jnp.where(hit, t, 0.0)
    c_sel = centers[idx]
    r_sel = radius[idx]
    p = origin + t_safe[:, None] * direction - c_sel     # surface offset vector
    pd = jnp.sum(p * direction, axis=-1)
    # Guard tangential hits (p.d == 0) and masked lanes.
    denom = jnp.where(jnp.abs(pd) > 1e-12, pd, 1.0)
    scale = jnp.where(hit & (jnp.abs(pd) > 1e-12), g_t / denom, 0.0)

    d_origin = -scale[:, None] * p
    d_direction = -(scale * t_safe)[:, None] * p
    d_c_rows = scale[:, None] * p
    d_r_rows = scale * r_sel

    n = centers.shape[0]
    d_centers = jnp.zeros_like(centers).at[idx].add(d_c_rows)
    d_radius = jnp.zeros_like(radius).at[idx].add(d_r_rows)
    return d_origin, d_direction, (d_centers, d_radius)


_sweep.defvjp(_sweep_fwd, _sweep_bwd)


def intersect_spheres_pallas(origin: jnp.ndarray, direction: jnp.ndarray,
                             scene: Scene, tmin: float = DEFAULT_TMIN,
                             interpret: bool = False) -> HitResult:
    """Drop-in replacement for :func:`ops.intersect.intersect_spheres` backed
    by the Pallas sweep kernel (float32 only). ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU-testable)."""
    t, idx = _sweep(origin, direction, (scene.center, scene.radius), tmin,
                    interpret)
    return HitResult(t=t, index=idx, hit=t < BIG)
