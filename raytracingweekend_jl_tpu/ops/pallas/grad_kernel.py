"""Fused bounce-level record/replay kernels — the flagship gradient path.

Round-2 measured the recorded-path gradient (ops/grad_trace.py) at 2.78
Mpaths/s against a 51 Mpaths/s forward, and localized the gap to per-bounce
XLA glue: the record phase lowers each bounce's shade into dozens of small
fusions over the multi-hundred-MB wavefront, and the reverse scan's
``jax.vjp`` of the bounce body does it again backwards (bench_history
grad_step_* rows; staged compaction measured NEGATIVE because the glue, not
dead-lane FLOPs, dominates). This module replaces both sides with ONE Pallas
kernel each per bounce:

- **record kernel** (`_record_shade_kernel`): the post-sweep bounce body —
  sky, hit geometry, all three materials, masked state advance — in one VMEM
  pass (the `_shade_core` math of the production forward kernel), which ALSO
  writes this bounce's residual record (input origin/direction/throughput,
  sweep t, alive mask, winning-sphere attribute rows) directly into the
  ``[depth, ...]`` record buffers (in-place via input/output aliasing and a
  scalar-prefetched bounce index), so the record phase costs one kernel +
  one sweep + one one-hot fetch per bounce and no extra copies.

- **replay kernel** (`_replay_bwd_kernel`): the HAND-WRITTEN adjoint of that
  bounce body. It re-seeds the same per-(bounce, block) hardware PRNG stream
  the record kernel used (counter-based replay — SURVEY.md §2.5's design is
  what makes the redraws bit-identical), recomputes the forward intermediates
  from the recorded state, and back-propagates the (origin, direction,
  throughput) cotangent chain while emitting per-ray cotangent rows for the
  winning sphere's (center, radius, albedo, fuzz, ir). The only non-kernel
  work per backward bounce is one exact bf16-split MXU contraction that
  scatter-adds those rows onto the sphere axis (the transpose of the one-hot
  fetch trick, ops/materials._onehot_rows_exact).

Gradient semantics match the recorded XLA path (ops/grad_trace.py): interior
gradients, discrete events (winner, alive transitions, Schlick coin, material
code, front-face) replayed as constants, hit distance differentiated through
the implicit sphere equation at the recorded winner (same closed forms as the
sweep kernel's VJP, intersect_kernel.py:153-175). The PRIMAL uses the
hardware-PRNG scatter stream (like the persistent forward family), not the
threefry stream of ``trace`` — images agree statistically, and the estimator
is self-consistent under ``value_and_grad`` because record and replay share
draws exactly. Validated in tests/test_grad_kernel.py against ``jax.vjp`` of
a pure-JAX twin fed the same uniforms, and by finite differences.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intersect import BIG
from .intersect_kernel import LANES, _pad_rows
from .shade_kernel import _shade_core, _uniforms, _gauss3, SHADE_ROWS
from ...utils.platform import host_callbacks_unsupported

#: Seed decorrelation constants (block vs bounce); replay MUST match record.
_BLOCK_SEED_STRIDE = 40503


def _seed_prng(seed_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0)
                    * jnp.int32(_BLOCK_SEED_STRIDE))


# ---------------------------------------------------------------------------
# Record kernel: shade one bounce + write the bounce's residual record
# ---------------------------------------------------------------------------

def _record_shade_kernel(b_ref, seed_ref, *refs, hw_prng: bool):
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    # Inputs: t, attrs10, state(13), rec(21, aliased — unread);
    # outputs: state(13) + rec(21).
    t_ref = refs[0]
    attr_refs = refs[1:11]
    st_in = refs[11:24]
    out = refs[45:]
    st_out = out[0:13]
    rec_out = out[13:34]

    if hw_prng:
        _seed_prng(seed_ref)
        u5 = _uniforms(t_ref.shape, 5)
    else:
        u5 = u5_ref[:]

    # Occupancy guard: an all-dead block's shade is the identity. The
    # aliasing shares HBM buffers but each ref still has its own VMEM
    # window that IS written back, so the skip branch must copy the state
    # through explicitly and zero the record's alive plane (af=0 is what
    # the replay kernel's guard keys on; the other record planes are never
    # read for dead blocks).
    anyalive = jnp.any(st_in[12][:] != 0)

    @pl.when(jnp.logical_not(anyalive))
    def _passthrough_block():
        for ref, src in zip(st_out, st_in):
            ref[:] = src[:]
        rec_out[10][0] = jnp.zeros(st_in[12].shape, jnp.int32)

    @pl.when(anyalive)
    def _record_block():
        ox, oy, oz = st_in[0][:], st_in[1][:], st_in[2][:]
        dx, dy, dz = st_in[3][:], st_in[4][:], st_in[5][:]
        tx, ty, tz = st_in[6][:], st_in[7][:], st_in[8][:]
        rx, ry, rz = st_in[9][:], st_in[10][:], st_in[11][:]
        af = st_in[12][:]
        t = t_ref[:]
        attrs_vals = tuple(a[:] for a in attr_refs)
        active = af != 0

        # Record the bounce INPUTS (what the replay kernel linearizes around).
        for ref, val in zip(rec_out,
                            (ox, oy, oz, dx, dy, dz, tx, ty, tz, t, af)
                            + attrs_vals):
            ref[0] = val

        (rx, ry, rz, hitm, _miss, px, py, pz, ndx, ndy, ndz,
         aar, aag, aab) = _shade_core(u5, t, attrs_vals, ox, oy, oz, dx, dy, dz,
                                      tx, ty, tz, rx, ry, rz, active)

        hf = hitm.astype(jnp.float32)
        nhf = 1.0 - hf
        vals = (hf * px + nhf * ox, hf * py + nhf * oy, hf * pz + nhf * oz,
                hf * ndx + nhf * dx, hf * ndy + nhf * dy, hf * ndz + nhf * dz,
                jnp.where(hitm, tx * aar, tx), jnp.where(hitm, ty * aag, ty),
                jnp.where(hitm, tz * aab, tz),
                rx, ry, rz, hitm.astype(jnp.int32))
        for ref, val in zip(st_out, vals):
            ref[:] = val


def record_shade_step(state: tuple, rec: tuple, t, attrs10_planes,
                      bounce, seed,
                      interpret: bool = False, u5=None):
    """One record-phase bounce over padded planes. ``state`` = 13
    [rows, LANES] planes (o3, d3, thr3, rad3, alive); ``rec`` = 21
    [depth, rows, LANES] buffers, updated in place at slice ``bounce``."""
    rows = state[0].shape[0]
    assert rows % SHADE_ROWS == 0, (rows, SHADE_ROWS)  # grid must cover all rows
    grid = rows // SHADE_ROWS
    hw_prng = u5 is None

    spec = pl.BlockSpec((SHADE_ROWS, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, SHADE_ROWS, LANES),
                            lambda i, b_ref, *_: (b_ref[0], i, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5]
        rng_specs = [pl.BlockSpec((5, SHADE_ROWS, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    n_state = 13
    n_rec = 21
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=rng_specs + [spec] * (11 + n_state) + [rec_spec] * n_rec,
        out_specs=[spec] * n_state + [rec_spec] * n_rec,
    )
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), s.dtype)
                   for s in state]
                  + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rec])
    base = 2 + len(rng_planes) + 11
    aliases = {base + i: i for i in range(n_state)}
    aliases.update({base + n_state + i: n_state + i for i in range(n_rec)})

    outs = pl.pallas_call(
        partial(_record_shade_kernel, hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(bounce, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, t, *attrs10_planes, *state, *rec)
    return tuple(outs[:n_state]), tuple(outs[n_state:])


def _bounce_adjoint(u5, vals, g3, cots, hitm, missm):
    """Hand-written adjoint of one recorded bounce (the transpose of
    _shade_core + the masked state advance), shared by the fixed-depth and
    persistent replay kernels.

    ``hitm`` marks lanes whose state ADVANCED this bounce (hit & continued);
    ``missm`` marks lanes that banked ``T * sky(d)`` into the radiance this
    bounce. Carried cotangents ``cots`` must already be zeroed on lanes whose
    forward chain was cut (persistent regen boundaries / inactive lanes);
    fixed-depth callers pass them through unchanged (dead lanes' passthrough
    identity carries them). Returns ``(cot9, dattr9)``: the cotangents w.r.t.
    this bounce's input (origin, direction, throughput) and the 9 per-ray
    sphere-attribute cotangent rows (center, radius, albedo, fuzz, ir)."""
    (ox, oy, oz, dx, dy, dz, Tx, Ty, Tz, t, attrs) = vals
    (acx, acy, acz, arr, aar, aag, aab, afz, air, amt) = attrs
    grx, gry, grz = g3
    (gox_, goy_, goz_, gdx_, gdy_, gdz_, gTx_, gTy_, gTz_) = cots
    hf = hitm.astype(jnp.float32)
    mf = missm.astype(jnp.float32)

    # ---- recompute forward intermediates (mirror of _shade_core) ----
    ts = jnp.where(hitm, t, 1.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz
    inv_r = jnp.where(arr == 0, 0.0, 1.0 / jnp.where(arr == 0, 1.0, arr))
    nox = (px - acx) * inv_r
    noy = (py - acy) * inv_r
    noz = (pz - acz) * inv_r
    ddn = dx * nox + dy * noy + dz * noz
    front = ddn < 0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nox * sgn, noy * sgn, noz * sgn
    g0, g1, g2 = _gauss3(u5[0], u5[1], u5[2], u5[3])
    gnorm = jax.lax.rsqrt(jnp.maximum(g0 * g0 + g1 * g1 + g2 * g2, 1e-20))
    ux, uy, uz = g0 * gnorm, g1 * gnorm, g2 * gnorm
    xi = u5[4]
    # lambert
    lx, ly, lz = nx + ux, ny + uy, nz + uz
    lsq = lx * lx + ly * ly + lz * lz
    degen = lsq < 1e-5
    lno = jax.lax.rsqrt(jnp.maximum(lsq, 1e-20))
    lamx = jnp.where(degen, nx, lx * lno)
    lamy = jnp.where(degen, ny, ly * lno)
    lamz = jnp.where(degen, nz, lz * lno)
    # metal
    dn = dx * nx + dy * ny + dz * nz
    refx = dx - 2.0 * dn * nx
    refy = dy - 2.0 * dn * ny
    refz = dz - 2.0 * dn * nz
    mxv = refx + afz * ux
    myv = refy + afz * uy
    mzv = refz + afz * uz
    mno = jax.lax.rsqrt(jnp.maximum(mxv * mxv + myv * myv + mzv * mzv, 1e-20))
    metx, mety, metz = mxv * mno, myv * mno, mzv * mno
    # dielectric
    safe_ir = jnp.where(air == 0, 1.0, air)
    eta = jnp.where(front, 1.0 / safe_ir, safe_ir)
    ct = jnp.minimum(-dn, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    cannot = eta * sin_t > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    omc = 1.0 - ct
    omc2 = omc * omc
    schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
    choose_ref = cannot | (schlick > xi)
    rpx = eta * (dx + ct * nx)
    rpy = eta * (dy + ct * ny)
    rpz = eta * (dz + ct * nz)
    S = 1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)
    par = -jnp.sqrt(jnp.abs(S))
    fx = rpx + par * nx
    fy = rpy + par * ny
    fz_ = rpz + par * nz
    fno = jax.lax.rsqrt(jnp.maximum(fx * fx + fy * fy + fz_ * fz_, 1e-20))
    frx, fry, frz = fx * fno, fy * fno, fz_ * fno
    is_lam = amt == 0
    is_met = amt == 1
    is_diel = (~is_lam) & (~is_met)

    # ---- adjoint ----
    nhf = 1.0 - hf
    # o' = hitm ? p : o ; d' = hitm ? nd : d ; T' = hitm ? T*A : T
    gpx, gpy, gpz = hf * gox_, hf * goy_, hf * goz_
    go_x, go_y, go_z = nhf * gox_, nhf * goy_, nhf * goz_
    gndx, gndy, gndz = hf * gdx_, hf * gdy_, hf * gdz_
    gd_x, gd_y, gd_z = nhf * gdx_, nhf * gdy_, nhf * gdz_
    gTx = gTx_ * jnp.where(hitm, aar, 1.0)
    gTy = gTy_ * jnp.where(hitm, aag, 1.0)
    gTz = gTz_ * jnp.where(hitm, aab, 1.0)
    gA_r, gA_g, gA_b = hf * gTx_ * Tx, hf * gTy_ * Ty, hf * gTz_ * Tz
    # miss lanes banked rad += T * sky(d); sky = (1-0.5s, 1-0.3s, 1), s=0.5(dy+1)
    sth = 0.5 * (dy + 1.0)
    gTx = gTx + mf * grx * (1.0 - 0.5 * sth)
    gTy = gTy + mf * gry * (1.0 - 0.3 * sth)
    gTz = gTz + mf * grz
    g_sth = mf * (grx * Tx * (-0.5) + gry * Ty * (-0.3))
    gd_y = gd_y + 0.5 * g_sth

    # route nd cotangent to the selected material branch
    lamf = is_lam.astype(jnp.float32)
    metf = is_met.astype(jnp.float32)
    dief = is_diel.astype(jnp.float32)
    glx_r, gly_r, glz_r = lamf * gndx, lamf * gndy, lamf * gndz
    gmx_r, gmy_r, gmz_r = metf * gndx, metf * gndy, metf * gndz
    gqx, gqy, gqz = dief * gndx, dief * gndy, dief * gndz

    # lambert: lam = degen ? n : l * lno (u constant)
    dotl = lamx * glx_r + lamy * gly_r + lamz * glz_r
    ndegf = 1.0 - degen.astype(jnp.float32)
    glx = ndegf * lno * (glx_r - lamx * dotl)
    gly = ndegf * lno * (gly_r - lamy * dotl)
    glz = ndegf * lno * (glz_r - lamz * dotl)
    degf = degen.astype(jnp.float32)
    gn_x = glx + degf * glx_r
    gn_y = gly + degf * gly_r
    gn_z = glz + degf * glz_r

    # metal: met = m * mno; m = refl + fz * u
    dotm = metx * gmx_r + mety * gmy_r + metz * gmz_r
    gmx = mno * (gmx_r - metx * dotm)
    gmy = mno * (gmy_r - mety * dotm)
    gmz = mno * (gmz_r - metz * dotm)
    gfz = ux * gmx + uy * gmy + uz * gmz
    grefl_x, grefl_y, grefl_z = gmx, gmy, gmz

    # dielectric select (coin/TIR detached)
    crf = choose_ref.astype(jnp.float32)
    grefl_x = grefl_x + crf * gqx
    grefl_y = grefl_y + crf * gqy
    grefl_z = grefl_z + crf * gqz
    ncrf = 1.0 - crf
    gfr_x, gfr_y, gfr_z = ncrf * gqx, ncrf * gqy, ncrf * gqz
    # fr = f * fno
    dotf = frx * gfr_x + fry * gfr_y + frz * gfr_z
    gf_x = fno * (gfr_x - frx * dotf)
    gf_y = fno * (gfr_y - fry * dotf)
    gf_z = fno * (gfr_z - frz * dotf)
    # f = rp + par * n
    grp_x, grp_y, grp_z = gf_x, gf_y, gf_z
    gpar = nx * gf_x + ny * gf_y + nz * gf_z
    gn_x = gn_x + par * gf_x
    gn_y = gn_y + par * gf_y
    gn_z = gn_z + par * gf_z
    # par = -sqrt(|S|)
    sgnS = jnp.where(S >= 0, 1.0, -1.0)
    gS = gpar * (-sgnS * 0.5
                 * jax.lax.rsqrt(jnp.maximum(jnp.abs(S), 1e-12)))
    # S = 1 - rp.rp
    grp_x = grp_x - 2.0 * rpx * gS
    grp_y = grp_y - 2.0 * rpy * gS
    grp_z = grp_z - 2.0 * rpz * gS
    # rp = eta * (d + ct * n)
    geta = ((dx + ct * nx) * grp_x + (dy + ct * ny) * grp_y
            + (dz + ct * nz) * grp_z)
    gd_x = gd_x + eta * grp_x
    gd_y = gd_y + eta * grp_y
    gd_z = gd_z + eta * grp_z
    gct = eta * (nx * grp_x + ny * grp_y + nz * grp_z)
    gn_x = gn_x + eta * ct * grp_x
    gn_y = gn_y + eta * ct * grp_y
    gn_z = gn_z + eta * ct * grp_z
    # ct = min(-dn, 1): pass-through where -dn < 1
    gdn = jnp.where(-dn < 1.0, -gct, 0.0)
    # eta = front ? 1/safe_ir : safe_ir
    gir = jnp.where(front, -geta / (safe_ir * safe_ir), geta)
    # refl = d - 2 dn n (metal + diel-reflect)
    gdn = gdn - 2.0 * (nx * grefl_x + ny * grefl_y + nz * grefl_z)
    gn_x = gn_x - 2.0 * dn * grefl_x
    gn_y = gn_y - 2.0 * dn * grefl_y
    gn_z = gn_z - 2.0 * dn * grefl_z
    gd_x = gd_x + grefl_x
    gd_y = gd_y + grefl_y
    gd_z = gd_z + grefl_z
    # dn = d . n
    gd_x = gd_x + gdn * nx
    gd_y = gd_y + gdn * ny
    gd_z = gd_z + gdn * nz
    gn_x = gn_x + gdn * dx
    gn_y = gn_y + gdn * dy
    gn_z = gn_z + gdn * dz
    # n = sgn * n_out; n_out = (p - c) * inv_r
    gno_x, gno_y, gno_z = sgn * gn_x, sgn * gn_y, sgn * gn_z
    gpx = gpx + gno_x * inv_r
    gpy = gpy + gno_y * inv_r
    gpz = gpz + gno_z * inv_r
    gc_x = -gno_x * inv_r
    gc_y = -gno_y * inv_r
    gc_z = -gno_z * inv_r
    gr = -(nox * gno_x + noy * gno_y + noz * gno_z) * inv_r
    # p = o + ts d
    go_x = go_x + gpx
    go_y = go_y + gpy
    go_z = go_z + gpz
    gd_x = gd_x + ts * gpx
    gd_y = gd_y + ts * gpy
    gd_z = gd_z + ts * gpz
    gt = dx * gpx + dy * gpy + dz * gpz
    # implicit hit distance at the recorded winner (intersect_kernel VJP forms)
    psx, psy, psz = px - acx, py - acy, pz - acz
    pd = psx * dx + psy * dy + psz * dz
    ok = hitm & (jnp.abs(pd) > 1e-12)
    scl = jnp.where(ok, gt / jnp.where(jnp.abs(pd) > 1e-12, pd, 1.0), 0.0)
    go_x = go_x - scl * psx
    go_y = go_y - scl * psy
    go_z = go_z - scl * psz
    gd_x = gd_x - scl * ts * psx
    gd_y = gd_y - scl * ts * psy
    gd_z = gd_z - scl * ts * psz
    gc_x = gc_x + scl * psx
    gc_y = gc_y + scl * psy
    gc_z = gc_z + scl * psz
    gr = gr + scl * arr
    return ((go_x, go_y, go_z, gd_x, gd_y, gd_z, gTx, gTy, gTz),
            (gc_x, gc_y, gc_z, gr, gA_r, gA_g, gA_b, gfz, gir))


# ---------------------------------------------------------------------------
# Replay kernel: hand-written adjoint of the recorded bounce
# ---------------------------------------------------------------------------

def _replay_bwd_kernel(b_ref, seed_ref, *refs, hw_prng: bool):
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    rec = refs[0:21]
    grad3 = refs[21:24]
    cot_in = refs[24:33]
    out = refs[33:]
    cot_out = out[0:9]
    dattr_out = out[9:18]

    # Occupancy guard: blocks whose recorded wavefront is entirely dead
    # are an identity shade — cotangents pass through via the input/output
    # aliasing (nothing written) and the attr cotangent rows are zero.
    anyalive = jnp.any(rec[10][0] != 0)

    @pl.when(jnp.logical_not(anyalive))
    def _skip_dead_block():
        # Aliasing shares HBM buffers, but the VMEM output windows are
        # still written back: passthrough must be explicit.
        for ref, src in zip(cot_out, cot_in):
            ref[:] = src[:]
        z = jnp.zeros(cot_in[0].shape, jnp.float32)
        for ref in dattr_out:
            ref[:] = z

    @pl.when(anyalive)
    def _full_adjoint():
        if hw_prng:
            _seed_prng(seed_ref)
            u5 = _uniforms(rec[0].shape[1:], 5)
        else:
            u5 = u5_ref[:]

        vals = tuple(r[0] for r in rec[0:10]) \
            + (tuple(r[0] for r in rec[11:21]),)
        af = rec[10][0]
        active = af != 0
        hit = rec[9][0] < jnp.float32(BIG)
        hitm = hit & active
        missm = active & ~hit
        cot9, dattr9 = _bounce_adjoint(
            u5, vals, tuple(g[:] for g in grad3),
            tuple(c[:] for c in cot_in), hitm, missm)
        for ref, val in zip(cot_out, cot9):
            ref[:] = val
        for ref, val in zip(dattr_out, dattr9):
            ref[:] = val


def replay_bwd_step(cot: tuple, rec: tuple, grad3: tuple, bounce, seed,
                    interpret: bool = False, u5=None):
    """One reverse bounce: consumes the bounce's record slice and the
    (o, d, thr) cotangent planes, returns the updated cotangents and 9
    per-ray sphere-attribute cotangent rows."""
    rows = cot[0].shape[0]
    assert rows % SHADE_ROWS == 0, (rows, SHADE_ROWS)  # grid must cover all rows
    grid = rows // SHADE_ROWS
    hw_prng = u5 is None

    spec = pl.BlockSpec((SHADE_ROWS, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, SHADE_ROWS, LANES),
                            lambda i, b_ref, *_: (b_ref[0], i, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5]
        rng_specs = [pl.BlockSpec((5, SHADE_ROWS, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=rng_specs + [rec_spec] * 21 + [spec] * 12,
        out_specs=[spec] * 18,
    )
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((rows, LANES), f32)] * 18
    base = 2 + len(rng_planes) + 21 + 3
    aliases = {base + i: i for i in range(9)}

    outs = pl.pallas_call(
        partial(_replay_bwd_kernel, hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(bounce, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, *rec, *grad3, *cot)
    return tuple(outs[:9]), tuple(outs[9:])


# ---------------------------------------------------------------------------
# Fused replay: the whole reverse bounce walk as ONE pallas_call
# ---------------------------------------------------------------------------
# Same design as the persistent path's persist_replay_fused (see
# persist_grad_kernel.py): replay consumes only records, so grid
# (block, bounce) with the bounce axis innermost keeps the 9 carried
# cotangent planes and the 3 radiance-gradient planes RESIDENT in VMEM
# while the record slices stream double-buffered — replacing max_depth
# kernel launches that each round-trip the carries through HBM. This is
# the launch-overhead lever for the paths that use the fixed-depth pair:
# sharded tiles (grad_mode="fused") and small images (< 2^17 pixels,
# resolve_grad_path), where per-launch cost dominates the tiny planes.

def _replay_bwd_fused_kernel(seed_ref, *refs, n_slots: int, hw_prng: bool):
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    rec = refs[0:21]
    grad3 = refs[21:24]
    out = refs[24:]
    cot_out = out[0:9]
    dattr_out = out[9:18]

    blk = pl.program_id(0)
    it = pl.program_id(1)
    slot = jnp.int32(n_slots - 1) - it

    # First bounce visited for this block: zero the resident carry windows
    # (the initial cotangent is zero; output blocks are not HBM-loaded).
    @pl.when(it == 0)
    def _init_carry():
        z = jnp.zeros(grad3[0].shape, jnp.float32)
        for ref in cot_out:
            ref[:] = z

    af = rec[10][0]
    anyalive = jnp.any(af != 0)

    @pl.when(jnp.logical_not(anyalive))
    def _skip_dead():
        # Carries are resident — untouched is the passthrough; the streamed
        # dattr slot must still be written.
        z = jnp.zeros(grad3[0].shape, jnp.float32)
        for ref in dattr_out:
            ref[0] = z

    @pl.when(anyalive)
    def _adjoint():
        if hw_prng:
            # The record kernel's per-call scalar was ``seed + bounce`` and
            # _seed_prng adds ``program_id(0) * stride`` (= the block).
            pltpu.prng_seed(seed_ref[0] + slot
                            + blk * jnp.int32(_BLOCK_SEED_STRIDE))
            u5 = _uniforms(af.shape, 5)
        else:
            u5 = u5_ref[0]

        vals = tuple(r[0] for r in rec[0:10]) \
            + (tuple(r[0] for r in rec[11:21]),)
        active = af != 0
        hit = rec[9][0] < jnp.float32(BIG)
        hitm = hit & active
        missm = active & ~hit
        cot9, dattr9 = _bounce_adjoint(
            u5, vals, tuple(g[:] for g in grad3),
            tuple(c[:] for c in cot_out), hitm, missm)
        for ref, val in zip(cot_out, cot9):
            ref[:] = val
        for ref, val in zip(dattr_out, dattr9):
            ref[0] = val


def replay_bwd_fused(rec: tuple, grad3: tuple, seed,
                     interpret: bool = False, u5_all=None):
    """The entire reverse bounce walk as one pallas_call: consumes the full
    21-slice record, returns ``(cot, dattr_all)`` where ``dattr_all`` is 9
    ``[max_depth, rows, LANES]`` planes (bounce-aligned with ``rec_idx``;
    dead-block slots are zero) for the per-bounce contraction scan.
    ``u5_all``: interpret-mode uniforms ``[max_depth, 5, rows, LANES]``."""
    n_slots, rows = rec[0].shape[0], rec[0].shape[1]
    assert rows % SHADE_ROWS == 0, (rows, SHADE_ROWS)
    grid = (rows // SHADE_ROWS, n_slots)
    hw_prng = u5_all is None

    spec = pl.BlockSpec((SHADE_ROWS, LANES), lambda b, it, *_: (b, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, SHADE_ROWS, LANES),
                            lambda b, it, *_: (n_slots - 1 - it, b, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5_all]
        rng_specs = [pl.BlockSpec(
            (1, 5, SHADE_ROWS, LANES),
            lambda b, it, *_: (n_slots - 1 - it, 0, b, 0),
            memory_space=pltpu.VMEM)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=rng_specs + [rec_spec] * 21 + [spec] * 3,
        out_specs=[spec] * 9 + [rec_spec] * 9,
    )
    f32 = jnp.float32
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), f32)] * 9
                  + [jax.ShapeDtypeStruct((n_slots, rows, LANES), f32)] * 9)

    outs = pl.pallas_call(
        partial(_replay_bwd_fused_kernel, n_slots=n_slots, hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, *rec, *grad3)
    return tuple(outs[:9]), tuple(outs[9:])


def _replay_fused_default() -> bool:
    """Fused whole-phase replay on/off. DEFAULT ON since the round-4
    on-device A/B: persistent pair 14.73 vs 14.08 Mpaths/s at flagship
    1 spp (16.39 vs 16.18 at spp 4), fixed-depth pair 8.71 vs 7.99 —
    bench_history *_rfused_* rows; gradients equal to f32 accumulation
    order (tpu_validate bitwise ray-grad check). RTW_REPLAY_FUSED=0
    opts out. Read at TRACE time (not part of the jit cache key): set
    it before the first compile of a program, fresh process per A/B."""
    return os.environ.get("RTW_REPLAY_FUSED", "1") == "1"


# ---------------------------------------------------------------------------
# Driver: custom-VJP trace built on the kernel pair
# ---------------------------------------------------------------------------

def _attr_mat(scene) -> jnp.ndarray:
    # Canonical [N, 10] ABI lives in materials.attr_mat; this name is kept
    # because persist_grad_kernel and the tests import it from here.
    from ..materials import attr_mat
    return attr_mat(scene)


def _base_seed(key: jax.Array) -> jnp.ndarray:
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jnp.sum(jax.random.key_data(key).astype(jnp.int32))
    if key.ndim:  # raw uint32[2] threefry key
        return jnp.sum(key.astype(jnp.int32))
    return jnp.asarray(key, jnp.int32)


def _u5_for(key, b, rows):
    """Interpret-mode uniforms — identical derivation in record and replay."""
    return jax.random.uniform(jax.random.fold_in(key, b),
                              (5, rows, LANES), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("max_depth", "tmin", "interpret"))
def _fused_record_forward(scene, origin, direction, key, max_depth, tmin,
                          interpret):
    from ..intersect import intersect_spheres
    from ..materials import fetch_attr_planes

    R = origin.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // SHADE_ROWS) * SHADE_ROWS
    f32 = jnp.float32

    pad = lambda x: _pad_rows(x.astype(f32), rows)
    ones = jnp.ones((rows, LANES), f32)
    zer = jnp.zeros((rows, LANES), f32)
    alive0 = _pad_rows((jnp.arange(rows * LANES) < R).astype(jnp.int32)
                       .reshape(-1), rows)
    state = (pad(origin[:, 0]), pad(origin[:, 1]), pad(origin[:, 2]),
             pad(direction[:, 0]), pad(direction[:, 1]), pad(direction[:, 2]),
             ones, ones, ones, zer, zer, zer, alive0)

    rec = tuple([jnp.zeros((max_depth, rows, LANES), f32)] * 10
                + [jnp.zeros((max_depth, rows, LANES), jnp.int32)]
                + [jnp.zeros((max_depth, rows, LANES), f32)] * 10)
    rec_idx = jnp.zeros((max_depth, R), jnp.int32)
    amat = _attr_mat(scene)
    seed = _base_seed(key)

    def body(b, carry):
        state, rec, rec_idx = carry
        if interpret:
            o = jnp.stack([p.reshape(-1)[:R] for p in state[0:3]], axis=-1)
            d = jnp.stack([p.reshape(-1)[:R] for p in state[3:6]], axis=-1)
            res = intersect_spheres(o, d, scene, tmin=tmin)
            hit_t = jnp.where(res.hit, res.t, jnp.float32(BIG))
            idx = res.index
            t_plane = pad(hit_t)
            attr_planes = [pad(amat[idx].T[i]) for i in range(10)]
        else:
            # Occupancy-masked sweep over the state planes directly: whole
            # (64,128) blocks of dead lanes skip the sphere loop entirely.
            # Camera-ray deaths are spatially correlated (sky/plain-ground
            # rows), so the fixed-depth record loop stops paying full-width
            # sweeps once a region's paths end.
            from .intersect_kernel import sweep_masked_planes
            t_plane, idx_plane = sweep_masked_planes(
                state[0:3], state[3:6], state[12], scene.center,
                scene.radius, tmin)
            idx = idx_plane.reshape(-1)[:R]
            attrs10t = fetch_attr_planes(idx, amat, scene.n_spheres)
            attr_planes = [pad(attrs10t[i]) for i in range(10)]
        u5 = _u5_for(key, b, rows) if interpret else None
        state, rec = record_shade_step(state, rec, t_plane, attr_planes,
                                       b, seed + b,
                                       interpret=interpret, u5=u5)
        rec_idx = rec_idx.at[b].set(idx)
        return state, rec, rec_idx

    state, rec, rec_idx = jax.lax.fori_loop(0, max_depth, body,
                                            (state, rec, rec_idx))
    radiance = jnp.stack([p.reshape(-1)[:R] for p in state[9:12]], axis=-1)
    return radiance.astype(origin.dtype), (rec, rec_idx)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def trace_recorded_fused(scene, origin, direction, key,
                         max_depth: int = 16, tmin: float = 1e-4,
                         interpret: bool = False):
    """Differentiable radiance ``[R,3]`` — kernel-pair recorded trace.

    Forward streams (hardware PRNG, persistent-family) differ from ``trace``;
    under ``value_and_grad`` the estimator is exact path replay."""
    radiance, _ = _fused_record_forward(scene, origin, direction, key,
                                        max_depth, tmin, interpret)
    return radiance


def _fused_fwd(scene, origin, direction, key, max_depth, tmin, interpret):
    radiance, res = _fused_record_forward(scene, origin, direction, key,
                                          max_depth, tmin, interpret)
    # Residuals must be JAX types: carry the ray dtype as a 0-length token.
    return radiance, (scene, key, res, jnp.zeros((0,), origin.dtype))


def _float0_like(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _split3_bf16(rows: jnp.ndarray) -> jnp.ndarray:
    """Exact 3-way bf16 split of an f32 matrix, packed side by side — the
    transpose counterpart of materials._onehot_rows_exact."""
    from ..materials import _bf16_split3
    return jnp.concatenate(_bf16_split3(rows), axis=1)


def _split3_bf16_rows(cols: jnp.ndarray) -> jnp.ndarray:
    """Exact 3-way bf16 split of an f32 [F, R] matrix, stacked along axis 0
    (the small-M layout used by the flipped dattr contraction)."""
    from ..materials import _bf16_split3
    return jnp.concatenate(_bf16_split3(cols), axis=0)


def _dattr_contract(dattr_flat9, idx, n: int):
    """Accumulate per-lane attribute cotangents into per-sphere rows:
    ``out[s, j] = sum_w (idx[w] == s) * dattr_flat9[j][w]`` ([n, 9] f32).

    dattr_flat9: 9 flat [R] f32 arrays (the replay kernel's output planes).
    The flipped (small-M) form keeps the 27-row attribute dim on the M axis
    instead of padding it to a 128-wide N tile (~4x less MXU work at record
    widths); the round-3b A/B measured it perf-neutral vs the row form on
    the full step, and it needs no [R, 9] restack. The two forms differ
    only in f32 accumulation ORDER (many partials per output row), i.e.
    last-ulp — gradients are FD-validated either way
    (:func:`_dattr_contract_rowform` is kept as the comparison oracle).
    """
    f32 = jnp.float32
    rows9t = jnp.stack(dattr_flat9, axis=0)          # [9, R]: no transpose
    rows27t = _split3_bf16_rows(rows9t)              # [27, R] bf16
    onehot = (idx[:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
              ).astype(jnp.bfloat16)                 # [R, n]
    c = jax.lax.dot_general(rows27t, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)  # [27, n]
    return (c[0:9] + c[9:18] + c[18:27]).T


def _dattr_contract_rowform(dattr_flat9, idx, n: int):
    """Row-form (N-padded) counterpart of :func:`_dattr_contract` — retired
    from production by the round-3b A/B; kept as the accumulation-order
    comparison oracle for tests."""
    f32 = jnp.float32
    rows9 = jnp.stack(dattr_flat9, axis=-1)              # [R, 9]
    onehot = (idx[:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
              ).astype(jnp.bfloat16)
    rows27 = _split3_bf16(rows9)
    c = jax.lax.dot_general(onehot, rows27, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
    return c[:, 0:9] + c[:, 9:18] + c[:, 18:27]


@partial(jax.jit, static_argnames=("max_depth", "tmin", "interpret", "R",
                                   "replay_fused"))
def _fused_bwd_impl(scene, key, rec, rec_idx, g_rad, max_depth, tmin,
                    interpret, R, replay_fused=False):
    rows = rec[0].shape[1]
    n = scene.n_spheres
    f32 = jnp.float32
    seed = _base_seed(key)
    pad = lambda x: _pad_rows(x.astype(f32), rows)
    grad3 = (pad(g_rad[:, 0]), pad(g_rad[:, 1]), pad(g_rad[:, 2]))
    zer = jnp.zeros((rows, LANES), f32)
    cot = (zer,) * 9
    g_attr = jnp.zeros((n, 9), f32)

    if replay_fused:
        u5_all = (jnp.stack([_u5_for(key, b, rows)
                             for b in range(max_depth)])
                  if interpret else None)
        cot, dattr_all = replay_bwd_fused(rec, grad3, seed,
                                          interpret=interpret, u5_all=u5_all)

        def one_slot(g, b):
            d9 = [jax.lax.dynamic_index_in_dim(p, b, keepdims=False)
                  .reshape(-1)[:R] for p in dattr_all]
            return g + _dattr_contract(d9, rec_idx[b], n), None

        g_attr, _ = jax.lax.scan(one_slot, g_attr,
                                 jnp.arange(max_depth, dtype=jnp.int32))
    else:
        def back(carry, b):
            cot, g_attr = carry
            u5 = _u5_for(key, b, rows) if interpret else None
            cot, dattr = replay_bwd_step(cot, rec, grad3, b, seed + b,
                                         interpret=interpret, u5=u5)
            g_attr = g_attr + _dattr_contract(
                [p.reshape(-1)[:R] for p in dattr], rec_idx[b], n)
            return (cot, g_attr), None

        (cot, g_attr), _ = jax.lax.scan(back, (cot, g_attr),
                                        jnp.arange(max_depth - 1, -1, -1))
    g_org = jnp.stack([p.reshape(-1)[:R] for p in cot[0:3]], axis=-1)
    g_dir = jnp.stack([p.reshape(-1)[:R] for p in cot[3:6]], axis=-1)
    return g_attr, g_org, g_dir


def _fused_bwd(max_depth, tmin, interpret, residuals, g_rad):
    scene, key, (rec, rec_idx), dtype_token = residuals
    R, dtype = g_rad.shape[0], dtype_token.dtype
    g_attr, g_org, g_dir = _fused_bwd_impl(scene, key, rec, rec_idx,
                                           g_rad.astype(jnp.float32),
                                           max_depth, tmin, interpret, R=R,
                                           replay_fused=_replay_fused_default())
    g_scene = scene._replace(
        center=g_attr[:, 0:3].astype(scene.center.dtype),
        radius=g_attr[:, 3].astype(scene.radius.dtype),
        albedo=g_attr[:, 4:7].astype(scene.albedo.dtype),
        fuzz=g_attr[:, 7].astype(scene.fuzz.dtype),
        ir=g_attr[:, 8].astype(scene.ir.dtype),
        mat=_float0_like(scene.mat))
    return (g_scene, g_org.astype(dtype), g_dir.astype(dtype),
            _float0_like(key))


trace_recorded_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Staged variant: compact the wavefront at bounce boundaries
# ---------------------------------------------------------------------------
# The fused path is SWEEP-bound (measured: 16 full-width sweeps = 92 ms of a
# 128 ms record forward at R=1M; the replay backward is 22 ms), and flagship
# occupancy falls to ~14% by bounce 4 — so unlike the XLA recorded path
# (glue-bound; staging measured NEGATIVE, bench_history grad_step_staged_*),
# compaction pays here: sweep cost is proportional to stage width.
#
# Budget contract (same as grad_trace.trace_recorded_staged): if more lanes
# are alive at a boundary than the next stage holds, the overflow lanes'
# tails are truncated AND their banked radiance is lost (alive lanes carry
# zero radiance — a lane only accumulates sky light at its death bounce), so
# both image and gradients bias DOWN. A jax.debug warning fires when it
# happens; widen the schedule if it does.

#: (first_bounce, width_divisor) schedule; conservative vs the measured
#: flagship occupancy curve [1, .84, .37, .22, .14, ...] (2x margin at each
#: boundary).
DEFAULT_STAGES = ((0, 1), (2, 2), (4, 4), (8, 8))


def _stage_plan(R: int, max_depth: int, stages) -> list:
    plan = []
    for i, (b0, div) in enumerate(stages):
        b1 = stages[i + 1][0] if i + 1 < len(stages) else max_depth
        b1 = min(b1, max_depth)
        if b0 >= max_depth or b1 <= b0:
            break
        rows = -(-(-(-R // div)) // LANES)
        rows = -(-rows // SHADE_ROWS) * SHADE_ROWS
        plan.append((b0, b1, rows))
    return plan


def _partition_alive(alive: jnp.ndarray):
    """Stable partition order: alive lanes first, original order preserved.
    cumsum-based (two prefix sums + one scatter — cheaper than argsort)."""
    ai = alive.astype(jnp.int32)
    n_alive = jnp.sum(ai)
    pos = jnp.where(alive, jnp.cumsum(ai) - 1,
                    n_alive + jnp.cumsum(1 - ai) - 1)
    order = jnp.zeros_like(pos).at[pos].set(
        jnp.arange(pos.shape[0], dtype=jnp.int32))
    return order, n_alive


@partial(jax.jit, static_argnames=("max_depth", "tmin", "interpret", "stages"))
def _fused_record_forward_staged(scene, origin, direction, key, max_depth,
                                 tmin, interpret, stages):
    from .intersect_kernel import intersect_spheres_pallas
    from ..intersect import intersect_spheres
    from ..materials import fetch_attr_planes

    R = origin.shape[0]
    plan = _stage_plan(R, max_depth, stages)
    f32 = jnp.float32
    amat = _attr_mat(scene)
    seed = _base_seed(key)

    rows0 = plan[0][2]
    pad0 = lambda x: _pad_rows(x.astype(f32), rows0)
    ones = jnp.ones((rows0, LANES), f32)
    zer = jnp.zeros((rows0, LANES), f32)
    alive0 = _pad_rows((jnp.arange(rows0 * LANES) < R).astype(jnp.int32),
                       rows0)
    state = (pad0(origin[:, 0]), pad0(origin[:, 1]), pad0(origin[:, 2]),
             pad0(direction[:, 0]), pad0(direction[:, 1]),
             pad0(direction[:, 2]), ones, ones, ones, zer, zer, zer, alive0)
    ids = jnp.arange(rows0 * LANES, dtype=jnp.int32)
    rad_accum = jnp.zeros((R, 3), f32)
    recs, rec_idxs, sels, ids_ps = [], [], [], []
    n_over = jnp.int32(0)

    for s, (b0, b1, rows_s) in enumerate(plan):
        Rs = rows_s * LANES
        if s > 0:
            flat = [p.reshape(-1) for p in state]
            alive = flat[12] != 0
            order, n_alive = _partition_alive(alive)
            n_over = n_over + jnp.maximum(n_alive - Rs, 0)
            # Bank radiance: only DEAD lanes carry any (a lane accumulates
            # sky light only at its death bounce), so banking everything and
            # zeroing the survivors' planes double-counts nothing.
            rad_accum = rad_accum.at[ids].add(
                jnp.stack(flat[9:12], axis=-1), mode="drop")
            sel = order[:Rs]
            zrad = jnp.zeros((rows_s, LANES), f32)
            state = tuple(
                zrad if 9 <= i <= 11 else _pad_rows(flat[i][sel], rows_s)
                for i in range(13))
            ids = ids[sel]
            sels.append(sel)
        ids_ps.append(ids)

        nb = b1 - b0
        rec = tuple([jnp.zeros((nb, rows_s, LANES), f32)] * 10
                    + [jnp.zeros((nb, rows_s, LANES), jnp.int32)]
                    + [jnp.zeros((nb, rows_s, LANES), f32)] * 10)
        rec_idx = jnp.zeros((nb, Rs), jnp.int32)

        def body(i, carry, b0=b0, rows_s=rows_s, Rs=Rs):
            state, rec, rec_idx = carry
            b = b0 + i
            o = jnp.stack([p.reshape(-1) for p in state[0:3]], axis=-1)
            d = jnp.stack([p.reshape(-1) for p in state[3:6]], axis=-1)
            if interpret:
                res = intersect_spheres(o, d, scene, tmin=tmin)
            else:
                res = intersect_spheres_pallas(o, d, scene, tmin=tmin)
            attrs10t = fetch_attr_planes(res.index, amat, scene.n_spheres) \
                if not interpret else amat[res.index].T
            t_plane = jnp.where(res.hit, res.t,
                                jnp.float32(BIG)).astype(jnp.float32) \
                .reshape(rows_s, LANES)
            attr_planes = [attrs10t[i].astype(jnp.float32)
                           .reshape(rows_s, LANES) for i in range(10)]
            u5 = _u5_for(key, b, rows_s) if interpret else None
            state, rec = record_shade_step(state, rec, t_plane, attr_planes,
                                           i, seed + b,
                                           interpret=interpret, u5=u5)
            rec_idx = rec_idx.at[i].set(res.index)
            return state, rec, rec_idx

        state, rec, rec_idx = jax.lax.fori_loop(0, nb, body,
                                                (state, rec, rec_idx))
        recs.append(rec)
        rec_idxs.append(rec_idx)

    flat = [p.reshape(-1) for p in state]
    rad_accum = rad_accum.at[ids].add(jnp.stack(flat[9:12], axis=-1),
                                      mode="drop")
    # Budget-overflow warning. jax.debug.print is a host callback, which the
    # axon PJRT cannot lower (UNIMPLEMENTED: host send/recv) — on that
    # platform the overflow count is still computed but the warning is
    # elided; validate schedules off-device or via trace_occupancy.
    if not host_callbacks_unsupported():
        jax.lax.cond(
            n_over > 0,
            lambda c: jax.debug.print(
                "WARNING trace_recorded_fused staged: {} lanes overflowed a "
                "stage budget — tails truncated (radiance/gradients biased "
                "down); widen the stage schedule", c),
            lambda c: None, n_over)
    return rad_accum.astype(origin.dtype), (tuple(recs), tuple(rec_idxs),
                                            tuple(sels), tuple(ids_ps))


@partial(jax.jit, static_argnames=("max_depth", "tmin", "interpret", "stages",
                                   "R"))
def _fused_bwd_impl_staged(scene, key, recs, rec_idxs, sels, ids_ps, g_rad,
                           max_depth, tmin, interpret, stages, R):
    plan = _stage_plan(R, max_depth, stages)
    n = scene.n_spheres
    f32 = jnp.float32
    seed = _base_seed(key)
    g_attr = jnp.zeros((n, 9), f32)
    cot_flat = None

    for s in reversed(range(len(plan))):
        b0, b1, rows_s = plan[s]
        Rs = rows_s * LANES
        nb = b1 - b0
        ids = ids_ps[s]
        safe = jnp.clip(ids, 0, R - 1)
        grad3_flat = g_rad[safe] * (ids < R).astype(f32)[:, None]
        grad3 = tuple(grad3_flat[:, i].reshape(rows_s, LANES)
                      for i in range(3))
        if cot_flat is None:
            cot = (jnp.zeros((rows_s, LANES), f32),) * 9
        else:
            # Lanes dropped at this boundary were DEAD: their cotangent is
            # exactly zero (state stopped; radiance already banked), so the
            # expansion scatters the survivors' cotangents and zero-fills.
            sel = sels[s]  # stage s+1 lane -> stage s lane index
            cot = tuple(
                jnp.zeros((Rs,), f32).at[sel].set(c).reshape(rows_s, LANES)
                for c in cot_flat)

        rec, rec_idx = recs[s], rec_idxs[s]

        def back(carry, i, b0=b0, rows_s=rows_s, rec=rec, rec_idx=rec_idx,
                 grad3=grad3):
            cot, g_attr = carry
            b = b0 + i
            u5 = _u5_for(key, b, rows_s) if interpret else None
            cot, dattr = replay_bwd_step(cot, rec, grad3, i, seed + b,
                                         interpret=interpret, u5=u5)
            g_attr = g_attr + _dattr_contract(
                [p.reshape(-1) for p in dattr], rec_idx[i], n)
            return (cot, g_attr), None

        (cot, g_attr), _ = jax.lax.scan(back, (cot, g_attr),
                                        jnp.arange(nb - 1, -1, -1))
        cot_flat = tuple(c.reshape(-1) for c in cot)

    g_org = jnp.stack([c[:R] for c in cot_flat[0:3]], axis=-1)
    g_dir = jnp.stack([c[:R] for c in cot_flat[3:6]], axis=-1)
    return g_attr, g_org, g_dir


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def trace_recorded_fused_staged(scene, origin, direction, key,
                                max_depth: int = 16, tmin: float = 1e-4,
                                interpret: bool = False,
                                stages: tuple = DEFAULT_STAGES):
    """Staged kernel-pair recorded trace: like :func:`trace_recorded_fused`
    but the wavefront compacts to survivors at the (static) stage boundaries,
    cutting the dominant dead-lane sweep cost ~3x at flagship occupancy.
    Different draws than the unstaged path (stage widths reseed the
    per-block PRNG) — statistically identical, exact replay under
    ``value_and_grad``."""
    radiance, _ = _fused_record_forward_staged(scene, origin, direction, key,
                                               max_depth, tmin, interpret,
                                               stages)
    return radiance


def _fused_staged_fwd(scene, origin, direction, key, max_depth, tmin,
                      interpret, stages):
    radiance, res = _fused_record_forward_staged(scene, origin, direction,
                                                 key, max_depth, tmin,
                                                 interpret, stages)
    return radiance, (scene, key, res, jnp.zeros((0,), origin.dtype))


def _fused_staged_bwd(max_depth, tmin, interpret, stages, residuals, g_rad):
    scene, key, (recs, rec_idxs, sels, ids_ps), dtype_token = residuals
    R, dtype = g_rad.shape[0], dtype_token.dtype
    g_attr, g_org, g_dir = _fused_bwd_impl_staged(
        scene, key, recs, rec_idxs, sels, ids_ps,
        g_rad.astype(jnp.float32), max_depth, tmin, interpret, stages, R=R)
    g_scene = scene._replace(
        center=g_attr[:, 0:3].astype(scene.center.dtype),
        radius=g_attr[:, 3].astype(scene.radius.dtype),
        albedo=g_attr[:, 4:7].astype(scene.albedo.dtype),
        fuzz=g_attr[:, 7].astype(scene.fuzz.dtype),
        ir=g_attr[:, 8].astype(scene.ir.dtype),
        mat=_float0_like(scene.mat))
    return (g_scene, g_org.astype(dtype), g_dir.astype(dtype),
            _float0_like(key))


trace_recorded_fused_staged.defvjp(_fused_staged_fwd, _fused_staged_bwd)
