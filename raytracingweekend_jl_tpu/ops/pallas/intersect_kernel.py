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

import os

#: Rays per program instance: (BLOCK_ROWS, 128) lanes. Env-tunable for block
#: size sweeps (RTW_BLOCK_ROWS); 64 measured best on v5e among {16, 32, 64}
#: (83.9 vs 72.8 vs 47.9 G pairs/s at flagship wavefront size).
BLOCK_ROWS = int(os.environ.get("RTW_BLOCK_ROWS", "64"))
LANES = 128
BLOCK = BLOCK_ROWS * LANES

#: Block rows for the occupancy-MASKED sweep only (the record phases'
#: sweep). Finer blocks trade dense-sweep throughput (the {16,32,64}
#: numbers above) for skip granularity: record-phase occupancy decays
#: 1.0 -> 0.03 across the head iterations and survivors are spatially
#: coherent, so a smaller all-dead guard can skip work the 64-row guard
#: cannot (round-5 campaign, GRAD_HEADROOM.md). Import-time read: one
#: value per process (A/B in fresh processes, like RTW_DATTR_GROUP).
MASKED_BLOCK_ROWS = int(os.environ.get("RTW_MASKED_BLOCK_ROWS",
                                       str(BLOCK_ROWS)))


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

    unroll = 8 if n_spheres % 8 == 0 else (2 if n_spheres % 2 == 0 else 1)

    def one(s, best_t, best_i):
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
        return jnp.where(ok, t, best_t), jnp.where(ok, s, best_i)

    def body(i, carry):
        best_t, best_i = carry
        # Python-unrolled pair: amortises loop/scalar-load overhead; the
        # sequential updates keep results identical to the rolled loop.
        for k in range(unroll):
            best_t, best_i = one(i * unroll + k, best_t, best_i)
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(0, n_spheres // unroll, body,
                                       (init_t, init_i))
    t_ref[:] = best_t
    idx_ref[:] = best_i


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows * LANES - x.shape[0]
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(rows, LANES)


# ---------------------------------------------------------------------------
# Occupancy-masked sweep: skip all-dead blocks
# ---------------------------------------------------------------------------

def _sweep_masked_kernel(cx_ref, cy_ref, cz_ref, ck_ref,
                         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         alive_ref, t_ref, idx_ref,
                         *, n_spheres: int, tmin: float):
    """The flat sweep with a per-BLOCK occupancy guard: when no lane in the
    (BLOCK_ROWS, 128) tile is alive, the whole sphere loop is skipped and the
    outputs are filled with miss values. Camera-ray deaths are spatially
    correlated (sky rows die at bounce 1, plain-ground rows by bounce 2-3),
    so with row-major wavefronts the guard eliminates most of the full-width
    sweeps the fixed-depth record forward pays after the first few bounces
    (flagship occupancy [1, .84, .37, .22, .14, ...])."""
    anyalive = jnp.any(alive_ref[:] != 0)

    @pl.when(anyalive)
    def _sweep_block():
        _sweep_kernel(cx_ref, cy_ref, cz_ref, ck_ref, ox_ref, oy_ref, oz_ref,
                      dx_ref, dy_ref, dz_ref, t_ref, idx_ref,
                      n_spheres=n_spheres, tmin=tmin)

    @pl.when(jnp.logical_not(anyalive))
    def _skip_block():
        t_ref[:] = jnp.full(t_ref.shape, jnp.float32(BIG))
        idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)


@partial(jax.jit, static_argnames=("tmin", "interpret"))
def sweep_masked(origin, direction, alive, centers, radius, tmin,
                 interpret=False):
    """Occupancy-masked sweep over flat [R] rays; ``alive`` int32/bool [R].
    Forward-only (no VJP): built for the record phase of the fused gradient
    path, whose custom VJP replays the recorded t instead of differentiating
    the sweep. Returns (t, idx) with t=BIG on dead lanes' skipped blocks."""
    R = origin.shape[0]
    ck = jnp.sum(centers * centers, axis=-1) - radius * radius
    n_spheres = centers.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    grid = rows // BLOCK_ROWS

    ray_planes = [
        _pad_rows(origin[:, 0], rows), _pad_rows(origin[:, 1], rows),
        _pad_rows(origin[:, 2], rows),
        _pad_rows(direction[:, 0], rows), _pad_rows(direction[:, 1], rows),
        _pad_rows(direction[:, 2], rows),
        _pad_rows(alive.astype(jnp.int32), rows),
    ]
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, *_refs: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
    )
    t, idx = pl.pallas_call(
        partial(_sweep_masked_kernel, n_spheres=n_spheres, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(centers[:, 0], centers[:, 1], centers[:, 2], ck, *ray_planes)
    return t.reshape(-1)[:R], idx.reshape(-1)[:R]


@partial(jax.jit, static_argnames=("tmin", "interpret"))
def sweep_masked_planes(o3: tuple, d3: tuple, alive_plane, centers, radius,
                        tmin, interpret=False):
    """``sweep_masked`` over pre-padded [rows, LANES] planes — the layout the
    persistent record loop already carries. Skips the flat round trip
    (stack to [R,3] then re-plane inside the wrapper), which is pure glue at
    record widths. Returns ``(t, idx)`` planes of the input shape."""
    rows = o3[0].shape[0]
    ck = jnp.sum(centers * centers, axis=-1) - radius * radius
    n_spheres = centers.shape[0]
    br = MASKED_BLOCK_ROWS
    rows_p = -(-rows // br) * br  # grid must cover all rows
    grid = rows_p // br

    def padp(p):
        if rows_p == rows:
            return p
        return jnp.concatenate(
            [p, jnp.zeros((rows_p - rows, LANES), p.dtype)], axis=0)

    ray_planes = [padp(p) for p in (*o3, *d3, alive_plane.astype(jnp.int32))]
    ray_spec = pl.BlockSpec((br, LANES), lambda i, *_refs: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
    )
    t, idx = pl.pallas_call(
        partial(_sweep_masked_kernel, n_spheres=n_spheres, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows_p, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows_p, LANES), jnp.int32)],
        interpret=interpret,
    )(centers[:, 0], centers[:, 1], centers[:, 2], ck, *ray_planes)
    return t[:rows], idx[:rows]


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


# ---------------------------------------------------------------------------
# Fused sweep + hit-attribute fetch (kernel v2)
# ---------------------------------------------------------------------------

def _sweep_fetch_kernel(cx_ref, cy_ref, cz_ref, ck_ref, r_ref, ar_ref, ag_ref,
                        ab_ref, fz_ref, ir_ref, mt_ref,  # [N] SMEM scalars
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        t_ref, idx_ref, bcx_ref, bcy_ref, bcz_ref, br_ref,
                        bar_ref, bag_ref, bab_ref, bfz_ref, bir_ref, bmt_ref,
                        *, n_spheres: int, tmin: float):
    """Sweep + running-select of the winning sphere's attributes.

    Eliminates the post-sweep one-hot [R,N] contraction entirely: the loop
    that already knows the winner tracks (center, radius, albedo, fuzz, ir,
    mat) alongside (best_t, best_idx) with one select each per sphere."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz

    big = jnp.float32(BIG)
    zeros = jnp.zeros(ox.shape, jnp.float32)
    init = (jnp.full(ox.shape, big, jnp.float32), jnp.zeros(ox.shape, jnp.int32),
            zeros, zeros, zeros, zeros, zeros, zeros, zeros, zeros, zeros, zeros)

    def body(s, carry):
        (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bfz, bir, bmt) = carry
        cxs, cys, czs, cks = cx_ref[s], cy_ref[s], cz_ref[s], ck_ref[s]
        cd = cxs * dx + cys * dy + czs * dz
        oc = cxs * ox + cys * oy + czs * oz
        hb = od - cd
        c = oo - 2.0 * oc + cks
        disc = hb * hb - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = -hb - sq
        t = jnp.where(r1 >= tmin, r1, -hb + sq)
        ok = (disc > 0) & (t >= tmin) & (t < bt)
        sel = lambda a, b_: jnp.where(ok, a, b_)
        return (sel(t, bt), sel(s, bi),
                sel(cxs, bcx), sel(cys, bcy), sel(czs, bcz), sel(r_ref[s], br),
                sel(ar_ref[s], bar), sel(ag_ref[s], bag), sel(ab_ref[s], bab),
                sel(fz_ref[s], bfz), sel(ir_ref[s], bir), sel(mt_ref[s], bmt))

    out = jax.lax.fori_loop(0, n_spheres, body, init)
    for ref, val in zip((t_ref, idx_ref, bcx_ref, bcy_ref, bcz_ref, br_ref,
                         bar_ref, bag_ref, bab_ref, bfz_ref, bir_ref, bmt_ref),
                        out):
        ref[:] = val


@partial(jax.jit, static_argnames=("tmin", "interpret"))
def _sweep_fetch_forward(origin, direction, centers, ck, radius, albedo, fuzz,
                         ir, mat_f, tmin, interpret=False):
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
    sphere_planes = [centers[:, 0], centers[:, 1], centers[:, 2], ck, radius,
                     albedo[:, 0], albedo[:, 1], albedo[:, 2], fuzz, ir, mat_f]

    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, *_refs: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=[ray_spec] * 12,
    )
    shapes = ([jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
               jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
              + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 10)
    outs = pl.pallas_call(
        partial(_sweep_fetch_kernel, n_spheres=n_spheres, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=shapes,
        interpret=interpret,
    )(*sphere_planes, *ray_planes)
    return tuple(o.reshape(-1)[:R] for o in outs)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sweep_fetch(origin, direction, scene_params, tmin, interpret):
    centers, radius, albedo, fuzz, ir, mat_f = scene_params
    ck = jnp.sum(centers * centers, axis=-1) - radius * radius
    return _sweep_fetch_forward(origin, direction, centers, ck, radius, albedo,
                                fuzz, ir, mat_f, tmin, interpret)


def _sweep_fetch_fwd(origin, direction, scene_params, tmin, interpret):
    out = _sweep_fetch(origin, direction, scene_params, tmin, interpret)
    t, idx = out[0], out[1]
    return out, (origin, direction, scene_params, t, idx)


def _sweep_fetch_bwd(tmin, interpret, residuals, cotangents):
    origin, direction, scene_params, t, idx = residuals
    centers, radius, albedo, fuzz, ir, mat_f = scene_params
    (g_t, _g_idx, g_cx, g_cy, g_cz, g_r, g_ar, g_ag, g_ab, g_fz, g_ir,
     _g_mt) = cotangents

    hit = t < BIG
    t_safe = jnp.where(hit, t, 0.0)
    c_sel = centers[idx]
    r_sel = radius[idx]
    p = origin + t_safe[:, None] * direction - c_sel
    pd = jnp.sum(p * direction, axis=-1)
    denom = jnp.where(jnp.abs(pd) > 1e-12, pd, 1.0)
    scale = jnp.where(hit & (jnp.abs(pd) > 1e-12), g_t / denom, 0.0)

    d_origin = -scale[:, None] * p
    d_direction = -(scale * t_safe)[:, None] * p

    # Attr-plane cotangents scatter back to the winning sphere rows (masked to
    # hits so miss lanes contribute nothing).
    m = hit.astype(g_cx.dtype)
    c_rows = jnp.stack([g_cx * m, g_cy * m, g_cz * m], -1) + scale[:, None] * p
    a_rows = jnp.stack([g_ar * m, g_ag * m, g_ab * m], -1)

    d_centers = jnp.zeros_like(centers).at[idx].add(
        jnp.where(hit[:, None], c_rows, 0.0))
    d_radius = jnp.zeros_like(radius).at[idx].add(
        jnp.where(hit, g_r * m + scale * r_sel, 0.0))
    d_albedo = jnp.zeros_like(albedo).at[idx].add(
        jnp.where(hit[:, None], a_rows, 0.0))
    d_fuzz = jnp.zeros_like(fuzz).at[idx].add(jnp.where(hit, g_fz * m, 0.0))
    d_ir = jnp.zeros_like(ir).at[idx].add(jnp.where(hit, g_ir * m, 0.0))
    d_mat = jnp.zeros_like(mat_f)
    return d_origin, d_direction, (d_centers, d_radius, d_albedo, d_fuzz,
                                   d_ir, d_mat)


_sweep_fetch.defvjp(_sweep_fetch_fwd, _sweep_fetch_bwd)


def intersect_fetch_pallas(origin: jnp.ndarray, direction: jnp.ndarray,
                           scene: Scene, tmin: float = DEFAULT_TMIN,
                           interpret: bool = False):
    """Fused sweep + attribute fetch: ``(HitResult, attrs)`` where ``attrs``
    is the ``(center, radius, albedo, fuzz, ir, mat)`` tuple `scatter` expects.
    Miss lanes get benign defaults (radius 0, ir 1) so no inf/NaN can leak
    into masked shading lanes or their gradients."""
    out = _sweep_fetch(origin, direction,
                       (scene.center, scene.radius, scene.albedo, scene.fuzz,
                        scene.ir, scene.mat.astype(jnp.float32)),
                       tmin, interpret)
    (t, idx, cx, cy, cz, r, ar, ag, ab, fz, irv, mt) = out
    hit = t < BIG
    center = jnp.stack([cx, cy, cz], axis=-1)
    albedo = jnp.stack([ar, ag, ab], axis=-1)
    attrs = (jnp.where(hit[:, None], center, 0.0),
             jnp.where(hit, r, 0.0),
             jnp.where(hit[:, None], albedo, 1.0),
             jnp.where(hit, fz, 0.0),
             jnp.where(hit, irv, 1.0),
             jnp.where(hit, mt, 0.0).astype(jnp.int32))
    return HitResult(t=t, index=idx, hit=hit), attrs
