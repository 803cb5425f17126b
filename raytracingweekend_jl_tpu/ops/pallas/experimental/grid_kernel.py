"""PROTOTYPE (experimental/, not a production path): two-level (cluster-bound) sphere sweep — the coarse spatial
structure named in docs/SWEEP_HEADROOM.md lever #1 and VERDICT r2 next-#3.

The reference has no acceleration structure at all (SURVEY.md "no BVH" —
src/hit.jl:38-50 scans every sphere per ray), and the production sweep
kernel (intersect_kernel.py) keeps that all-pairs shape because it is
perfectly regular for the VPU. The book scene IS a grid, though
(src/scenes.jl:56 lays spheres on a 22x22 lattice), so this prototype
measures the only >2x lever the speed-of-light accounting left open:
**fewer pairs, not faster pairs**.

Design (TPU-shaped: the win must come at BLOCK granularity, since per-lane
divergent sphere lists cannot be vectorized on a (8,128) VPU):

- Host-side, the scene is split into GLOBAL spheres (ground, the big three,
  degenerate padding — always swept) and grid spheres, clustered by (x, z)
  into K cells padded to a uniform capacity P (dummy slots get ck=1e30 so
  their discriminant is always negative).
- The kernel sweeps global spheres unconditionally, then for each cluster
  tests its bounding sphere against the whole block's rays. Only when ANY
  lane's ray can still hit the bound (disc > 0, exit >= tmin, entry < its
  running best) does the 16-sphere fine loop run, guarded by ``pl.when``.
- Winners are tracked through an index-map so results are bit-identical to
  the flat sweep (the bound test is conservative: a cluster's bounding
  sphere contains its members, so no true hit can be culled).

Whether blocks ever skip depends entirely on LANE ORDERING — the strided
production layout spreads a block across the full film (measured negative
for axis culling, SWEEP_HEADROOM.md), while tile-ordered camera rays give
each block a narrow frustum. scripts/spatial_probe.py measures both; the
decision record lives in docs/SPATIAL.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ....scene import Scene
from ...intersect import HitResult, DEFAULT_TMIN, BIG
from ..intersect_kernel import LANES, BLOCK_ROWS, _pad_rows

#: Dummy-slot ck: forces disc = hb^2 - (oo - 2 oc + ck) < 0 for any
#: plausible ray (f32-safe: well below overflow, far above scene scale).
_DUMMY_CK = np.float32(1e30)


def build_grid(scene: Scene, grid: int = 6, pad_mult: int = 4):
    """Cluster a (trimmed) scene's small spheres into a ``grid x grid``
    (x, z) lattice of uniform-capacity cluster lists + bounding spheres.

    Returns a dict of numpy arrays: permuted sphere SoA (``cx cy cz ck``)
    laid out [global..., cluster0 slots..., cluster1 slots...], the original
    index map ``im``, cluster bounds (``bx by bz bk``), and the static
    layout (n_global, K, P).
    """
    c = np.asarray(scene.center, np.float64)
    r = np.asarray(scene.radius, np.float64)
    n = c.shape[0]
    # Global = big (|r| >= 1, incl. the ground) or degenerate/far spheres.
    is_global = (np.abs(r) >= 1.0) | (r == 0.0) | (np.abs(c).max(1) > 100.0)
    gi = np.where(is_global)[0]
    si = np.where(~is_global)[0]

    # Uniform (x, z) bins over the small spheres' bounding box (guard the
    # degenerate 0- or 1-sphere cases: span 0 and empty member lists).
    if len(si):
        lo = c[si][:, [0, 2]].min(0) - 1e-6
        hi = c[si][:, [0, 2]].max(0) + 1e-6
        span = np.maximum(hi - lo, 1e-9)
        cell = np.minimum(((c[si][:, [0, 2]] - lo) / span * grid).astype(int),
                          grid - 1)
        cid = cell[:, 0] * grid + cell[:, 1]
    else:
        cid = np.zeros((0,), int)
    K = grid * grid
    members = [si[cid == k] for k in range(K)]
    P = max(max(len(m) for m in members), 1)
    P = -(-P // pad_mult) * pad_mult

    n_global = len(gi)
    total = n_global + K * P
    cx = np.zeros(total, np.float32)
    cy = np.zeros(total, np.float32)
    cz = np.zeros(total, np.float32)
    ck = np.full(total, _DUMMY_CK, np.float32)
    im = np.zeros(total, np.int32)
    order = list(gi)
    ck_all = (c * c).sum(1) - r * r
    for j, s in enumerate(gi):
        cx[j], cy[j], cz[j] = c[s]
        ck[j] = ck_all[s]
        im[j] = s
    bx = np.zeros(K, np.float32)
    by = np.zeros(K, np.float32)
    bz = np.zeros(K, np.float32)
    bk = np.zeros(K, np.float32)
    for k in range(K):
        m = members[k]
        base = n_global + k * P
        for j, s in enumerate(m):
            cx[base + j], cy[base + j], cz[base + j] = c[s]
            ck[base + j] = ck_all[s]
            im[base + j] = s
        order.extend(m)
        if len(m):
            ctr = c[m].mean(0)
            rad = np.max(np.linalg.norm(c[m] - ctr, axis=1) + np.abs(r[m]))
        else:
            ctr, rad = np.array([0.0, 0.0, 0.0]), 0.0
        bx[k], by[k], bz[k] = ctr
        bk[k] = (ctr * ctr).sum() - rad * rad
    assert len(order) == n
    return dict(cx=cx, cy=cy, cz=cz, ck=ck, im=im,
                bx=bx, by=by, bz=bz, bk=bk,
                n_global=n_global, K=K, P=P)


def _grid_sweep_kernel(bx_ref, by_ref, bz_ref, bk_ref,
                       cx_ref, cy_ref, cz_ref, ck_ref, im_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       t_ref, idx_ref, skip_ref,
                       *, n_global: int, K: int, P: int, tmin: float):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    big = jnp.float32(BIG)

    t_ref[:] = jnp.full(ox.shape, big, jnp.float32)
    idx_ref[:] = jnp.zeros(ox.shape, jnp.int32)
    skip_ref[:] = jnp.zeros(ox.shape, jnp.int32)

    def one(s):
        cxs, cys, czs, cks = cx_ref[s], cy_ref[s], cz_ref[s], ck_ref[s]
        cd = cxs * dx + cys * dy + czs * dz
        oc = cxs * ox + cys * oy + czs * oz
        hb = od - cd
        cq = oo - 2.0 * oc + cks
        disc = hb * hb - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = -hb - sq
        t = jnp.where(r1 >= tmin, r1, -hb + sq)
        bt = t_ref[:]
        ok = (disc > 0) & (t >= tmin) & (t < bt)
        t_ref[:] = jnp.where(ok, t, bt)
        idx_ref[:] = jnp.where(ok, im_ref[s], idx_ref[:])

    def gbody(i, _):
        one(i)
        return 0

    jax.lax.fori_loop(0, n_global, gbody, 0)

    def cbody(k, _):
        bxs, bys, bzs, bks = bx_ref[k], by_ref[k], bz_ref[k], bk_ref[k]
        cd = bxs * dx + bys * dy + bzs * dz
        oc = bxs * ox + bys * oy + bzs * oz
        hb = od - cd
        cq = oo - 2.0 * oc + bks
        disc = hb * hb - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        # Conservative: any lane whose ray pierces the bound in (tmin, best)
        reach = (disc > 0) & (-hb + sq >= tmin) & (-hb - sq < t_ref[:])
        anyhit = jnp.any(reach)

        @pl.when(anyhit)
        def _fine():
            def fbody(j, _):
                one(n_global + k * P + j)
                return 0
            # Mosaic only supports unroll=1 or full unroll for scans.
            jax.lax.fori_loop(0, P, fbody, 0, unroll=P)

        @pl.when(jnp.logical_not(anyhit))
        def _count():
            skip_ref[:] = skip_ref[:] + 1

        return 0

    jax.lax.fori_loop(0, K, cbody, 0)


@partial(jax.jit, static_argnames=("n_global", "K", "P", "tmin", "interpret"))
def grid_sweep(origin, direction, planes, n_global, K, P,
               tmin=DEFAULT_TMIN, interpret=False):
    """Two-level sweep. ``planes`` = (bx, by, bz, bk, cx, cy, cz, ck, im)
    from :func:`build_grid` (as jnp arrays). Returns (t, idx, skips) where
    ``skips`` is the per-block count of culled clusters [grid]."""
    R = origin.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    grid = rows // BLOCK_ROWS

    ray_planes = [
        _pad_rows(origin[:, 0], rows), _pad_rows(origin[:, 1], rows),
        _pad_rows(origin[:, 2], rows),
        _pad_rows(direction[:, 0], rows), _pad_rows(direction[:, 1], rows),
        _pad_rows(direction[:, 2], rows),
    ]
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    # Mosaic rejects sub-(8,128) scalar output blocks; the count is
    # broadcast over a full VMEM plane (diagnostic output, negligible
    # traffic) and one element per block is read back.
    skip_spec = ray_spec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=[ray_spec, ray_spec, skip_spec],
    )
    t, idx, skips = pl.pallas_call(
        partial(_grid_sweep_kernel, n_global=n_global, K=K, P=P, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)],
        interpret=interpret,
    )(*planes, *ray_planes)
    return (t.reshape(-1)[:R], idx.reshape(-1)[:R],
            skips[::BLOCK_ROWS, 0])


def intersect_spheres_grid(origin, direction, scene: Scene,
                           g: dict | None = None,
                           tmin: float = DEFAULT_TMIN,
                           interpret: bool = False):
    """HitResult-compatible wrapper (forward only — prototype)."""
    if g is None:
        g = build_grid(scene)
    planes = tuple(jnp.asarray(g[k]) for k in
                   ("bx", "by", "bz", "bk", "cx", "cy", "cz", "ck", "im"))
    t, idx, skips = grid_sweep(origin, direction, planes, g["n_global"],
                               g["K"], g["P"], tmin, interpret)
    return HitResult(t=t, index=idx, hit=t < BIG), skips
