"""Persistent-record gradient kernels: strip-refilled record/replay.

The fixed-depth fused record path (grad_kernel.py) pays ``max_depth``
full-width sweeps although the flagship mean path length is 3.15 bounces —
after bounce 3 over 3/4 of the wavefront is dead weight (measured occupancy
[1, .84, .37, .22, .14, ...], docs/ROADMAP.md). XLA-level compaction was
measured NEGATIVE twice (gather/scatter cost dominates), so this module keeps
lanes full the way the production forward does
(``persistent_render_sum_strided``): each lane owns ``n_strips`` rays spaced
``W`` apart and REFILLS IN PLACE when its path terminates, recording
per-ITERATION residuals instead of per-bounce ones. Lane-iterations drop from
``max_depth * R`` to ``~mean_path * n_strips * W * slack`` — ~3x fewer sweeps
— at the cost of a slack-bounded iteration budget (see the overflow contract
below).

Per iteration the record kernel consumes the occupancy-masked sweep result
and advances a 12-plane state machine (o, d, throughput, bounce counter,
strip counter, active), banking ``T * sky(d)`` into the terminating ray's
strip radiance plane and selecting the next strip's ray on regeneration. It
writes this iteration's residual record — input (o, d, T), sweep t, the
winning sphere's 10 attribute rows, and one packed int32 flag plane
(act | hit<<1 | term<<2 | regen<<3 | strip<<4).

The replay kernel walks iterations in REVERSE, reusing the fixed-depth
path's hand-written bounce adjoint (``grad_kernel._bounce_adjoint``) with
persistent masks: carried (o, d, T) cotangents are DEPOSITED into the
started strip's ray-gradient planes and zeroed at regen boundaries (the
forward chain is cut there — the fresh ray is not a function of the dead
path), radiance gradients are STRIP-SELECTED from ``g_rad`` reshaped
``[n_strips, W]`` (a layout transform, no gather — ray id = strip * W +
lane), and sky injection happens at miss-termination iterations. Per-ray
sphere-attribute cotangent rows go through the same exact bf16-split MXU
contraction as the fixed-depth path.

Overflow contract: ``n_iters`` is a static CAP (the record buffer's leading
axis), but the record phase is a ``while_loop`` that exits at the REALIZED
max lane-iteration count — with the default cap (``n_strips * max_depth``,
the worst case) no path can ever be dropped. The cap's slack costs
record-buffer memory; on the replay side the cost depends on the mode: the
LOOP replay walks exactly the REALIZED iteration count (recovered from the
per-iteration active counts) via a dynamic-lower-bound while loop, while
the default FUSED replay visits every slot in-grid (slack slots skip their
adjoint in-kernel but still stream their zeroed record slices from HBM —
size ``n_iters`` generously and you pay backward bandwidth, not compute).
A caller-supplied
smaller cap trades exactness for memory: overflowing lanes contribute ZERO
for truncated/unstarted rays — the primal and gradient stay self-consistent
(unfinished paths never inject), the image is biased low, and the driver
surfaces the dropped count (``persist_dropped_paths``).

Gradient semantics (interior gradients, discrete events replayed as
constants, implicit hit-distance) are identical to trace_recorded_fused;
reference semantics: /root/reference/src/ray_color.jl:14-38.
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
from .shade_kernel import _shade_core, _uniforms, SHADE_ROWS
from .grad_kernel import (_bounce_adjoint, _seed_prng, _attr_mat, _base_seed,
                          _dattr_contract, _float0_like,
                          _replay_fused_default, _BLOCK_SEED_STRIDE)


#: Slots per dattr-contraction dot in the fused replay (see
#: _run_replay_phase_fused). Read ONCE at import so the value is fixed for
#: every trace in the process (a trace-time env read would silently ignore
#: mid-process toggles — ADVICE r3); A/B via RTW_DATTR_GROUP in a fresh
#: process. Default from the round-4 on-device A/B (grad_bench
#: ``default_auto`` vs ``dattrg1``/``dattrg16`` rows).
_DATTR_GROUP = int(os.environ.get("RTW_DATTR_GROUP", "8"))


#: RTW_PERSIST_BLOCK_ROWS override, read ONCE at import: record (forward
#: trace) and replay (backward trace) MUST decompose into the same blocks
#: — the hw PRNG stream is seeded per (iteration, block) — so a per-call
#: env read could let a mid-process toggle split the pair and silently
#: replay wrong scatter directions (round-4 review; same rule as
#: _DATTR_GROUP). A/B in a fresh process.
_BLOCK_ROWS_ENV = os.environ.get("RTW_PERSIST_BLOCK_ROWS")


def _persist_block_rows(n_strips: int) -> int:
    """Block rows for the persistent kernels: the tuned 64 up to S=8;
    S>=16 carries too many strip/rad planes for 64-row blocks (a
    reproducible remote-compile failure, almost certainly VMEM) and runs
    at 32. Import-time env override for A/B (RTW_PERSIST_BLOCK_ROWS)."""
    if _BLOCK_ROWS_ENV:
        return int(_BLOCK_ROWS_ENV)
    return SHADE_ROWS if n_strips < 16 else 32

#: flag-plane bit layout (record kernel writes, replay kernel reads)
_F_ACT, _F_HIT, _F_TERM, _F_REGEN = 1, 2, 4, 8
_F_STRIP_SHIFT = 4


def persist_record_bytes(R: int, n_strips: int, n_iters: int | None = None,
                         tail_compact: tuple | None = None,
                         max_depth: int = 16, rec_attrs: bool = True) -> int:
    """Exact HBM footprint (bytes) of ONE pass's record residuals for
    :func:`trace_recorded_persist` — 21 f32/int32 record planes plus the
    winner-index buffer and counts, per phase, at the real padded widths.

    The generic per-ray-per-bounce formulas in grad.py overestimate this
    path ~15x (they price the worst-case iteration CAP at full width, but
    phase 1 allocates only ``b1`` slices and the post-boundary tail runs at
    1/wdiv width), which made the pass-level remat trigger at spp where the
    records actually fit HBM — recomputing every record forward for
    nothing. The pass loop's remat decision uses this exact count instead.
    """
    S = n_strips
    if n_iters is None:
        n_iters = default_n_iters(S, max_depth)
    rows, W = _strip_geometry(R, S)
    n_rec = 21 if rec_attrs else 11

    def phase(nslices, rws):
        # rec planes + rec_idx (int32) per slice, + counts.
        return nslices * (rws * LANES * (n_rec + 1) * 4 + 4)

    if tail_compact is None:
        return phase(n_iters, rows)
    b1 = min(tail_compact[0], n_iters)
    br2 = _persist_block_rows(S)
    rows2 = -(-max(rows // tail_compact[1], br2) // br2) * br2
    # + the boundary gather's sel/valid vectors (2 x W2 int32).
    return (phase(b1, rows) + phase(n_iters - b1, rows2)
            + 2 * rows2 * LANES * 4)


def default_n_iters(n_strips: int, max_depth: int = 16) -> int:
    """Default iteration CAP: the worst case ``n_strips * max_depth`` — with
    the while-loop record phase the cap costs only record-buffer memory and
    cheaply-skipped backward iterations, never forward compute, so the
    default buys GUARANTEED zero dropped paths. (A mean-plus-slack budget
    was measured insufficient at flagship: lane strips sit ~W rays apart,
    which is vertically-correlated image geometry — glass-column lanes
    draw several long paths in a row and the tail decays slowly: 2.5% of
    paths dropped at budget 32, 0.095% at 48.)"""
    return n_strips * max_depth


# ---------------------------------------------------------------------------
# Record kernel: one persistent iteration + residual record
# ---------------------------------------------------------------------------

def _advance_record_bank(u5, t, attrs_vals, strip_vals, st_vals,
                         rad_vals, max_depth: int, S: int):
    """The persistent state machine shared by both record kernels: shade the
    swept bounce, compute the event masks, bank terminating rays' radiance
    into their strip planes, advance continuing lanes, refill terminated
    lanes from the next strip. Returns ``(rec21, new_state12, new_rad3S)``
    as VALUES (the caller writes them to its refs). The flag packing here
    is the replay kernel's contract — change them together."""
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, bo, sp, act) = st_vals
    active = act != 0
    zf = jnp.zeros(t.shape, jnp.float32)
    (bkr, bkg, bkb, hitm, miss, px, py, pz, ndx, ndy, ndz,
     aar, aag, aab) = _shade_core(u5, t, attrs_vals, ox, oy, oz,
                                  dx, dy, dz, tx, ty, tz,
                                  zf, zf, zf, active)

    newb = bo + 1
    cont = hitm & (newb < max_depth)
    exhausted = hitm & ~cont
    term = miss | exhausted
    nxt_s = sp + 1

    # The driver pads every strip to full width with guaranteed-miss dummy
    # rays (one-iteration paths, output sliced off), so every next strip is
    # valid — no per-lane ray-id bookkeeping in the kernel.
    can = term & (nxt_s < S)

    # Residual record: this iteration's INPUTS + packed events.
    flags = (act
             + (hitm.astype(jnp.int32) << 1)
             + (term.astype(jnp.int32) << 2)
             + (can.astype(jnp.int32) << 3)
             + (sp << _F_STRIP_SHIFT))
    rec21 = (ox, oy, oz, dx, dy, dz, tx, ty, tz, t, flags) + attrs_vals

    # Bank the terminating ray's radiance into its strip plane.
    new_rad = []
    for c in range(S):
        sel = miss & (sp == c)
        sf = sel.astype(jnp.float32)
        nsf = 1.0 - sf
        new_rad += [sf * bkr + nsf * rad_vals[3 * c + 0],
                    sf * bkg + nsf * rad_vals[3 * c + 1],
                    sf * bkb + nsf * rad_vals[3 * c + 2]]

    # Advance on continue.
    cf = cont.astype(jnp.float32)
    ncf = 1.0 - cf
    ox = cf * px + ncf * ox
    oy = cf * py + ncf * oy
    oz = cf * pz + ncf * oz
    dx = cf * ndx + ncf * dx
    dy = cf * ndy + ncf * dy
    dz = cf * ndz + ncf * dz
    tx = jnp.where(cont, tx * aar, tx)
    ty = jnp.where(cont, ty * aag, ty)
    tz = jnp.where(cont, tz * aab, tz)
    bo = jnp.where(cont, newb, bo)

    # Refill from the next strip's pre-generated ray.
    canf = can.astype(jnp.float32)
    nanf = 1.0 - canf
    for c in range(1, S):
        sel = (can & (nxt_s == c)).astype(jnp.float32)
        nsl = 1.0 - sel
        ox = sel * strip_vals[6 * c + 0] + nsl * ox
        oy = sel * strip_vals[6 * c + 1] + nsl * oy
        oz = sel * strip_vals[6 * c + 2] + nsl * oz
        dx = sel * strip_vals[6 * c + 3] + nsl * dx
        dy = sel * strip_vals[6 * c + 4] + nsl * dy
        dz = sel * strip_vals[6 * c + 5] + nsl * dz
    tx = canf * 1.0 + nanf * tx
    ty = canf * 1.0 + nanf * ty
    tz = canf * 1.0 + nanf * tz
    bo = jnp.where(can, 0, bo)
    sp = jnp.where(can, nxt_s, sp)
    act = ((active & ~term) | can).astype(jnp.int32)

    new_state = (ox, oy, oz, dx, dy, dz, tx, ty, tz, bo, sp, act)
    return rec21, new_state, tuple(new_rad)


def _persist_record_kernel(i_ref, seed_ref, *refs, max_depth: int,
                           n_strips: int, hw_prng: bool, n_rec: int = 21):
    S = n_strips
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    t_ref = refs[0]
    attr_refs = refs[1:11]
    strip_refs = refs[11:11 + 6 * S]          # o3 then d3, per strip
    st_in = refs[11 + 6 * S:23 + 6 * S]       # 12 planes
    rad_in = refs[23 + 6 * S:23 + 9 * S]      # 3S planes (aliased)
    out = refs[23 + 9 * S + n_rec:]           # skip aliased rec inputs
    st_out = out[0:12]
    rad_out = out[12:12 + 3 * S]
    rec_out = out[12 + 3 * S:12 + 3 * S + n_rec]  # 21 or 11 rec slices

    anyactive = jnp.any(st_in[11][:] != 0)

    @pl.when(jnp.logical_not(anyactive))
    def _passthrough():
        # Aliased HBM buffers still DMA their VMEM output windows back:
        # every output must be written explicitly.
        for ref, src in zip(st_out, st_in):
            ref[:] = src[:]
        for ref, src in zip(rad_out, rad_in):
            ref[:] = src[:]
        zf = jnp.zeros(st_in[0].shape, jnp.float32)
        for j, ref in enumerate(rec_out):
            ref[0] = jnp.zeros(st_in[0].shape, jnp.int32) if j == 10 else zf

    @pl.when(anyactive)
    def _iterate():
        if hw_prng:
            _seed_prng(seed_ref)
            u5 = _uniforms(t_ref.shape, 5)
        else:
            u5 = u5_ref[:]
        rec21, new_state, new_rad = _advance_record_bank(
            u5, t_ref[:], tuple(a[:] for a in attr_refs),
            tuple(r[:] for r in strip_refs), tuple(r[:] for r in st_in),
            tuple(r[:] for r in rad_in), max_depth, S)
        for ref, val in zip(rec_out, rec21):
            ref[0] = val
        for ref, val in zip(rad_out, new_rad):
            ref[:] = val
        for ref, val in zip(st_out, new_state):
            ref[:] = val


def persist_record_step(state: tuple, rad: tuple, rec: tuple,
                        strip_planes: tuple, t, attrs10_planes,
                        iteration, seed, max_depth: int, n_strips: int,
                        interpret: bool = False, u5=None):
    """One persistent record iteration over padded planes. ``state`` = 12
    [rows, LANES] planes (o3, d3, thr3, bounce, strip, active); ``rad`` = 3S
    strip radiance planes; ``rec`` = 21 (or 11 when the driver refetches
    attrs in replay, ``rec_attrs=False``) [n_iters, rows, LANES] buffers,
    updated in place at slice ``iteration``; ``strip_planes`` = 6S ray
    planes."""
    rows = state[0].shape[0]
    S = n_strips
    br = _persist_block_rows(S)
    if rows % br != 0:  # a remainder row would silently fall off the grid
        raise ValueError(f"rows={rows} not divisible by block rows {br} "
                         "(check RTW_PERSIST_BLOCK_ROWS)")
    grid = rows // br
    hw_prng = u5 is None

    spec = pl.BlockSpec((br, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, br, LANES),
                            lambda i, b_ref, *_: (b_ref[0], i, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5]
        rng_specs = [pl.BlockSpec((5, br, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    n_state, n_rad, n_rec = 12, 3 * S, len(rec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=(rng_specs + [spec] * (11 + 6 * S + n_state + n_rad)
                  + [rec_spec] * n_rec),
        out_specs=[spec] * (n_state + n_rad) + [rec_spec] * n_rec,
    )
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), s.dtype)
                   for s in state]
                  + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * n_rad
                  + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rec])
    base = 2 + len(rng_planes) + 11 + 6 * S
    aliases = {base + i: i for i in range(n_state + n_rad)}
    aliases.update({base + n_state + n_rad + i: n_state + n_rad + i
                    for i in range(n_rec)})

    outs = pl.pallas_call(
        partial(_persist_record_kernel, max_depth=max_depth, n_strips=S,
                hw_prng=hw_prng, n_rec=n_rec),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(iteration, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, t, *attrs10_planes, *strip_planes, *state, *rad, *rec)
    return (tuple(outs[:n_state]),
            tuple(outs[n_state:n_state + n_rad]),
            tuple(outs[n_state + n_rad:]))



# ---------------------------------------------------------------------------
# Single-dispatch record kernel: sweep + attr fetch + shade + record
# ---------------------------------------------------------------------------
# The 3-dispatch iteration (masked sweep -> MXU one-hot fetch -> record
# kernel) pays per-iteration XLA glue (flat stacks/reshapes) and two extra
# launches ~80 times per chunk; this variant runs the WHOLE iteration as one
# pallas_call: the sphere sweep with a running select of the winner's
# attribute rows (the v2 _sweep_fetch_kernel pattern, intersect_kernel.py),
# then the shade/advance/refill state machine and the residual record. The
# winner index is recorded as a 22nd record plane (replacing the driver-side
# rec_idx scatter). Miss lanes record Zero attrs (the running select's init)
# instead of sphere-0 rows — every attr-dependent term in the forward and
# the replay adjoint is hit-gated, so the semantics are identical.

def _persist_record_fused_kernel(i_ref, seed_ref, cx_ref, cy_ref, cz_ref,
                                 ck_ref, r_ref, ar_ref, ag_ref, ab_ref,
                                 fz_ref, ir_ref, mt_ref, *refs,
                                 max_depth: int, n_strips: int,
                                 n_spheres: int, tmin: float, hw_prng: bool):
    S = n_strips
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    strip_refs = refs[0:6 * S]
    st_in = refs[6 * S:12 + 6 * S]
    rad_in = refs[12 + 6 * S:12 + 9 * S]
    out = refs[34 + 9 * S:]                   # skip aliased rec inputs (22)
    st_out = out[0:12]
    rad_out = out[12:12 + 3 * S]
    rec_out = out[12 + 3 * S:34 + 3 * S]      # 22 rec slices (incl. idx)

    anyactive = jnp.any(st_in[11][:] != 0)

    @pl.when(jnp.logical_not(anyactive))
    def _passthrough():
        for ref, src in zip(st_out, st_in):
            ref[:] = src[:]
        for ref, src in zip(rad_out, rad_in):
            ref[:] = src[:]
        zf = jnp.zeros(st_in[0].shape, jnp.float32)
        zi = jnp.zeros(st_in[0].shape, jnp.int32)
        for j, ref in enumerate(rec_out):
            ref[0] = zi if j in (10, 21) else zf

    @pl.when(anyactive)
    def _iterate():
        if hw_prng:
            _seed_prng(seed_ref)
            u5 = _uniforms(st_in[0].shape, 5)
        else:
            u5 = u5_ref[:]

        ox, oy, oz = st_in[0][:], st_in[1][:], st_in[2][:]
        dx, dy, dz = st_in[3][:], st_in[4][:], st_in[5][:]
        tx, ty, tz = st_in[6][:], st_in[7][:], st_in[8][:]
        bo, sp, act = st_in[9][:], st_in[10][:], st_in[11][:]
        active = act != 0

        # --- in-kernel sweep + running winner-attribute select ---
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        zeros = jnp.zeros(ox.shape, jnp.float32)
        init = (jnp.full(ox.shape, jnp.float32(BIG), jnp.float32),
                jnp.zeros(ox.shape, jnp.int32)) + (zeros,) * 10

        def one(sph, carry):
            (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bfz, bir, bmt) = carry
            cxs, cys, czs, cks = (cx_ref[sph], cy_ref[sph], cz_ref[sph],
                                  ck_ref[sph])
            cd = cxs * dx + cys * dy + czs * dz
            oc = cxs * ox + cys * oy + czs * oz
            hb = od - cd
            c = oo - 2.0 * oc + cks
            disc = hb * hb - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = -hb - sq
            tt = jnp.where(r1 >= tmin, r1, -hb + sq)
            ok = (disc > 0) & (tt >= tmin) & (tt < bt)
            sel = lambda a, b_: jnp.where(ok, a, b_)
            return (sel(tt, bt), sel(sph, bi),
                    sel(cxs, bcx), sel(cys, bcy), sel(czs, bcz),
                    sel(r_ref[sph], br), sel(ar_ref[sph], bar),
                    sel(ag_ref[sph], bag), sel(ab_ref[sph], bab),
                    sel(fz_ref[sph], bfz), sel(ir_ref[sph], bir),
                    sel(mt_ref[sph], bmt))

        unroll = 2 if n_spheres % 2 == 0 else 1

        def sbody(i, carry):
            for k in range(unroll):
                carry = one(i * unroll + k, carry)
            return carry

        (t, idx, acx, acy, acz, arr, aar_, aag_, aab_, afz, air, amt) = \
            jax.lax.fori_loop(0, n_spheres // unroll, sbody, init)
        attrs_vals = (acx, acy, acz, arr, aar_, aag_, aab_, afz, air, amt)

        rec21, new_state, new_rad = _advance_record_bank(
            u5, t, attrs_vals, tuple(r[:] for r in strip_refs),
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, bo, sp, act),
            tuple(r[:] for r in rad_in), max_depth, S)
        for ref, val in zip(rec_out, rec21 + (idx,)):
            ref[0] = val
        for ref, val in zip(rad_out, new_rad):
            ref[:] = val
        for ref, val in zip(st_out, new_state):
            ref[:] = val


def persist_record_fused_step(state: tuple, rad: tuple, rec: tuple,
                              strip_planes: tuple, scene, iteration, seed,
                              max_depth: int, n_strips: int,
                              tmin: float, interpret: bool = False, u5=None):
    """One persistent record iteration as ONE pallas_call (in-kernel sweep +
    winner-attribute select). ``rec`` here has 22 planes — the last is the
    int32 winner-index plane."""
    rows = state[0].shape[0]
    S = n_strips
    # MUST match _persist_block_rows(S): the hw PRNG stream is seeded per
    # (iteration, block) and the replay kernels re-derive it with
    # _persist_block_rows-shaped blocks — a different decomposition here
    # would silently replay the wrong scatter directions (round-4 review:
    # this used to hardcode SHADE_ROWS, breaking RTW_PERSIST_BLOCK_ROWS
    # retunes and S>=16 under fused_step).
    br = _persist_block_rows(S)
    if rows % br != 0:  # a remainder row would silently fall off the grid
        raise ValueError(f"rows={rows} not divisible by block rows {br} "
                         "(check RTW_PERSIST_BLOCK_ROWS)")
    grid = rows // br
    hw_prng = u5 is None
    f32 = jnp.float32

    spec = pl.BlockSpec((br, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, br, LANES),
                            lambda i, *_refs: (_refs[0][0], i, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5]
        rng_specs = [pl.BlockSpec((5, br, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    n_state, n_rad, n_rec = 12, 3 * S, 22
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(grid,),
        in_specs=(rng_specs + [spec] * (6 * S + n_state + n_rad)
                  + [rec_spec] * n_rec),
        out_specs=[spec] * (n_state + n_rad) + [rec_spec] * n_rec,
    )
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), x.dtype)
                   for x in state]
                  + [jax.ShapeDtypeStruct((rows, LANES), f32)] * n_rad
                  + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rec])
    base = 13 + len(rng_planes) + 6 * S
    aliases = {base + i: i for i in range(n_state + n_rad)}
    aliases.update({base + n_state + n_rad + i: n_state + n_rad + i
                    for i in range(n_rec)})

    ck = jnp.sum(scene.center * scene.center, axis=-1) - scene.radius ** 2
    outs = pl.pallas_call(
        partial(_persist_record_fused_kernel, max_depth=max_depth,
                n_strips=S, n_spheres=scene.n_spheres, tmin=tmin,
                hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(iteration, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      scene.center[:, 0].astype(f32), scene.center[:, 1].astype(f32),
      scene.center[:, 2].astype(f32), ck.astype(f32),
      scene.radius.astype(f32),
      scene.albedo[:, 0].astype(f32), scene.albedo[:, 1].astype(f32),
      scene.albedo[:, 2].astype(f32), scene.fuzz.astype(f32),
      scene.ir.astype(f32), scene.mat.astype(f32),
      *rng_planes, *strip_planes, *state, *rad, *rec)
    return (tuple(outs[:n_state]),
            tuple(outs[n_state:n_state + n_rad]),
            tuple(outs[n_state + n_rad:]))


# ---------------------------------------------------------------------------
# Replay kernel: reverse iteration with regen-boundary cotangent resets
# ---------------------------------------------------------------------------

def _persist_replay_kernel(i_ref, seed_ref, *refs, n_strips: int,
                           hw_prng: bool, rec_attrs: bool = True):
    S = n_strips
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    # rec_attrs=True: 21 per-iteration record slices. rec_attrs=False: 11
    # record slices + 10 attr planes the driver refetched from the winner
    # indices (same total, so every later offset is unchanged).
    rec = refs[0:21] if rec_attrs else refs[0:11]
    attr_refs = None if rec_attrs else refs[11:21]
    grad_strips = refs[21:21 + 3 * S]
    cot_in = refs[21 + 3 * S:30 + 3 * S]
    dep_in = refs[30 + 3 * S:30 + 9 * S]      # 6S deposit planes (aliased)
    out = refs[30 + 9 * S:]
    cot_out = out[0:9]
    dattr_out = out[9:18]
    dep_out = out[18:18 + 6 * S]

    flags = rec[10][0]
    anyactive = jnp.any((flags & _F_ACT) != 0)

    @pl.when(jnp.logical_not(anyactive))
    def _skip():
        for ref, src in zip(cot_out, cot_in):
            ref[:] = src[:]
        z = jnp.zeros(cot_in[0].shape, jnp.float32)
        for ref in dattr_out:
            ref[:] = z
        for ref, src in zip(dep_out, dep_in):
            ref[:] = src[:]

    @pl.when(anyactive)
    def _adjoint():
        if hw_prng:
            _seed_prng(seed_ref)
            u5 = _uniforms(rec[0].shape[1:], 5)
        else:
            u5 = u5_ref[:]

        if rec_attrs:
            attrs_vals = tuple(r[0] for r in rec[11:21])
        else:
            attrs_vals = tuple(a[:] for a in attr_refs)
        cot9, dattr9, new_dep = _replay_iter_core(
            u5, tuple(r[0] for r in rec[0:10]), attrs_vals, flags,
            tuple(c[:] for c in cot_in),
            tuple(g[:] for g in grad_strips),
            tuple(d[:] for d in dep_in), S)
        for ref, val in zip(dep_out, new_dep):
            ref[:] = val
        for ref, val in zip(cot_out, cot9):
            ref[:] = val
        for ref, val in zip(dattr_out, dattr9):
            ref[:] = val


# ---------------------------------------------------------------------------
# Fused replay kernel: the whole reverse walk as ONE pallas_call
# ---------------------------------------------------------------------------
# The per-iteration replay above re-launches a kernel per slot and round-trips
# every carried plane (9 cotangents + 6S deposits, in AND out) plus the 3S
# radiance-gradient strips through HBM on every slot — ~130 MB of traffic per
# iteration whose contents barely change, dominated by per-launch XLA glue.
# Replay consumes only the records (no sweep), so unlike the record phase the
# whole reverse walk fuses into one kernel: grid (block, slot) with the slot
# axis innermost walks each block's slots newest-to-oldest while the carried
# cotangent/deposit planes and the grad strips stay RESIDENT in VMEM
# (iteration-independent index maps); only the record slices stream (double-
# buffered DMA overlapping the adjoint math) and the dattr planes stream out
# for the per-slot exact contraction afterwards. Slack slots past the
# realized count have all-zero flags and skip. Numerics: per-lane cotangent
# chains are the identical op sequence (bitwise ray gradients); the dattr
# contraction differs from the loop replay's only in slot accumulation
# ORDER (last-ulp; disclaimed in _dattr_contract).


def _replay_iter_core(u5, rec_vals10, attrs_vals, flags, cots,
                      strip_grad_vals, dep_vals, S: int):
    """Shared per-iteration replay math for the loop and fused kernels (one
    source for the numerics the loop-vs-fused bitwise contract relies on):
    decode the event flags, deposit carried (o, d) cotangents into regen-
    started strips, cut chains, strip-select the radiance gradient, and run
    the bounce adjoint. ``rec_vals10`` = the 10 bounce-input record VALUES;
    ``attrs_vals`` = the 10 winner-attribute planes (recorded or refetched);
    ``dep_vals`` = current 6S deposit values. Returns
    ``(cot9, dattr9, new_dep)`` — strip 0's deposits pass through."""
    act = (flags & _F_ACT) != 0
    hit = (flags & _F_HIT) != 0
    term = (flags & _F_TERM) != 0
    regen = (flags & _F_REGEN) != 0
    sp = flags >> _F_STRIP_SHIFT

    # Deposit the carried (o, d) cotangent into the strip the regen
    # started (it is the cotangent of that strip's camera ray); the
    # initial throughput is the constant 1. Each strip starts at exactly
    # one iteration per lane, so a masked blend suffices.
    new_dep = list(dep_vals)
    for c in range(1, S):
        sel = regen & (sp + 1 == c)
        sf = sel.astype(jnp.float32)
        nsf = 1.0 - sf
        for j in range(6):
            new_dep[6 * c + j] = sf * cots[j] + nsf * dep_vals[6 * c + j]

    # Cut the chain where the forward did: regen boundaries and inactive
    # lanes carry no cotangent into this iteration.
    czero = term | ~act
    cots = tuple(jnp.where(czero, 0.0, c) for c in cots)

    # Strip-select this lane's radiance gradient.
    g3 = [jnp.zeros(flags.shape, jnp.float32)] * 3
    for c in range(S):
        self_ = (sp == c).astype(jnp.float32)
        g3 = [g3[j] + self_ * strip_grad_vals[3 * c + j] for j in range(3)]

    vals = tuple(rec_vals10) + (tuple(attrs_vals),)
    adv = hit & ~term          # state advanced (hit & continued)
    inject = act & ~hit        # banked T * sky(d) this iteration
    cot9, dattr9 = _bounce_adjoint(u5, vals, tuple(g3), cots, adv, inject)
    return cot9, dattr9, tuple(new_dep)

def _persist_replay_fused_kernel(i0_ref, seed_ref, *refs, n_strips: int,
                                 n_slots: int, hw_prng: bool):
    S = n_strips
    if hw_prng:
        u5_ref = None
    else:
        u5_ref, refs = refs[0], refs[1:]
    rec = refs[0:21]
    grad_strips = refs[21:21 + 3 * S]
    cot_in = refs[21 + 3 * S:30 + 3 * S]
    dep_in = refs[30 + 3 * S:30 + 9 * S]
    out = refs[30 + 9 * S:]
    cot_out = out[0:9]
    dep_out = out[9:9 + 6 * S]
    dattr_out = out[9 + 6 * S:18 + 6 * S]

    blk = pl.program_id(0)
    it = pl.program_id(1)
    slot = jnp.int32(n_slots - 1) - it

    # First slot visited for this block: seed the resident carry windows
    # (output blocks are write-only until written — there is no HBM load).
    @pl.when(it == 0)
    def _init_carry():
        for ref, src in zip(cot_out, cot_in):
            ref[:] = src[:]
        for ref, src in zip(dep_out, dep_in):
            ref[:] = src[:]

    flags = rec[10][0]
    anyactive = jnp.any((flags & _F_ACT) != 0)

    @pl.when(jnp.logical_not(anyactive))
    def _skip():
        # Carries are resident — untouched is the passthrough. The streamed
        # dattr slot must still be written.
        z = jnp.zeros(flags.shape, jnp.float32)
        for ref in dattr_out:
            ref[0] = z

    @pl.when(anyactive)
    def _adjoint():
        if hw_prng:
            # Reproduce the record phase's per-(iteration, block) stream:
            # its per-call scalar was ``seed + i_abs`` and _seed_prng adds
            # ``program_id(0) * stride`` with program_id(0) = the block.
            pltpu.prng_seed(seed_ref[0] + i0_ref[0] + slot
                            + blk * jnp.int32(_BLOCK_SEED_STRIDE))
            u5 = _uniforms(flags.shape, 5)
        else:
            u5 = u5_ref[0]

        # Carries are the resident output windows (read-modify-write).
        cot9, dattr9, new_dep = _replay_iter_core(
            u5, tuple(r[0] for r in rec[0:10]),
            tuple(r[0] for r in rec[11:21]), flags,
            tuple(c[:] for c in cot_out),
            tuple(g[:] for g in grad_strips),
            tuple(d[:] for d in dep_out), S)
        for ref, val in zip(dep_out, new_dep):
            ref[:] = val
        for ref, val in zip(cot_out, cot9):
            ref[:] = val
        for ref, val in zip(dattr_out, dattr9):
            ref[0] = val


def persist_replay_fused(cot: tuple, dep: tuple, rec: tuple,
                         grad_strips: tuple, i0, seed, n_strips: int,
                         interpret: bool = False, u5_all=None):
    """The ENTIRE reverse walk of one record phase as one pallas_call.

    ``rec`` must be the 21-slice record (``rec_attrs=True``); ``i0`` is the
    phase's absolute base iteration (PRNG streams are seeded by the absolute
    index, exactly as the record phase). Returns ``(cot, dep, dattr_all)``
    where ``dattr_all`` is 9 ``[n_slots, rows, LANES]`` planes (slot-aligned
    with ``rec``/``rec_idx``; slack slots are zero) for the per-slot
    :func:`grad_kernel._dattr_contract`. ``u5_all``: interpret-mode uniforms
    ``[n_slots, 5, rows, LANES]`` (slot-indexed, absolute-iteration streams).
    """
    assert len(rec) == 21, (len(rec), "fused replay needs the full record")
    rows = cot[0].shape[0]
    S = n_strips
    # Block rows MUST equal the record phase's (_persist_block_rows): the
    # hardware PRNG stream is seeded per (iteration, block) and _uniforms
    # draws are block-shape-dependent, so a different replay decomposition
    # would silently replay the wrong path. Retry a VMEM-bound compile with
    # RTW_PERSIST_BLOCK_ROWS=32, which retunes BOTH phases consistently.
    br = _persist_block_rows(S)
    if rows % br != 0:  # a remainder row would silently fall off the grid
        raise ValueError(f"rows={rows} not divisible by block rows {br} "
                         "(check RTW_PERSIST_BLOCK_ROWS)")
    n_blocks = rows // br
    n_slots = rec[0].shape[0]
    hw_prng = u5_all is None

    res_spec = pl.BlockSpec((br, LANES), lambda b, it, *_: (b, 0),
                            memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, br, LANES),
                            lambda b, it, *_: (n_slots - 1 - it, b, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5_all]
        rng_specs = [pl.BlockSpec(
            (1, 5, br, LANES),
            lambda b, it, *_: (n_slots - 1 - it, 0, b, 0),
            memory_space=pltpu.VMEM)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks, n_slots),
        in_specs=(rng_specs + [rec_spec] * 21
                  + [res_spec] * (3 * S + 9 + 6 * S)),
        out_specs=[res_spec] * (9 + 6 * S) + [rec_spec] * 9,
    )
    f32 = jnp.float32
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), f32)] * (9 + 6 * S)
                  + [jax.ShapeDtypeStruct((n_slots, rows, LANES), f32)] * 9)

    outs = pl.pallas_call(
        partial(_persist_replay_fused_kernel, n_strips=S, n_slots=n_slots,
                hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray(i0, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, *rec, *grad_strips, *cot, *dep)
    return (tuple(outs[:9]), tuple(outs[9:9 + 6 * S]),
            tuple(outs[9 + 6 * S:]))


def persist_replay_step(cot: tuple, dep: tuple, rec: tuple,
                        grad_strips: tuple, iteration, seed, n_strips: int,
                        interpret: bool = False, u5=None, attrs=None):
    """One reverse persistent iteration: consumes the iteration's record
    slice, the carried cotangents, and the strip deposit planes; returns
    (cot, dep, dattr9). ``attrs``: 10 [rows, LANES] winner-attribute planes
    when the record carries only 11 slices (``rec_attrs=False`` — the
    driver refetched them from the winner indices)."""
    rows = cot[0].shape[0]
    S = n_strips
    br = _persist_block_rows(S)
    if rows % br != 0:  # a remainder row would silently fall off the grid
        raise ValueError(f"rows={rows} not divisible by block rows {br} "
                         "(check RTW_PERSIST_BLOCK_ROWS)")
    grid = rows // br
    hw_prng = u5 is None
    rec_attrs = attrs is None
    assert len(rec) == (21 if rec_attrs else 11), (len(rec), rec_attrs)

    spec = pl.BlockSpec((br, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((1, br, LANES),
                            lambda i, b_ref, *_: (b_ref[0], i, 0),
                            memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [u5]
        rng_specs = [pl.BlockSpec((5, br, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    rec_in_specs = [rec_spec] * 21 if rec_attrs \
        else [rec_spec] * 11 + [spec] * 10
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=(rng_specs + rec_in_specs
                  + [spec] * (3 * S + 9 + 6 * S)),
        out_specs=[spec] * (18 + 6 * S),
    )
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((rows, LANES), f32)] * (18 + 6 * S)
    base = 2 + len(rng_planes) + 21 + 3 * S
    aliases = {base + i: i for i in range(9)}                 # cot
    aliases.update({base + 9 + i: 18 + i for i in range(6 * S)})  # deposits

    outs = pl.pallas_call(
        partial(_persist_replay_kernel, n_strips=S, hw_prng=hw_prng,
                rec_attrs=rec_attrs),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(jnp.asarray(iteration, jnp.int32).reshape(1,),
      jnp.asarray(seed, jnp.int32).reshape(1,),
      *rng_planes, *rec, *(attrs or ()), *grad_strips, *cot, *dep)
    return tuple(outs[:9]), tuple(outs[18:]), tuple(outs[9:18])


# ---------------------------------------------------------------------------
# Driver: custom-VJP trace built on the persistent kernel pair
# ---------------------------------------------------------------------------

def _strip_geometry(R: int, n_strips: int):
    """Lanes per strip, padded to whole SHADE blocks."""
    per = -(-R // n_strips)
    rows = -(-(-(-per // LANES)) // SHADE_ROWS) * SHADE_ROWS
    return rows, rows * LANES


def _strip_delta(W: int) -> int:
    """Per-strip circular-roll shift decorrelating a lane's strips.

    Without it, lane ``l``'s strips are rays ``l, l+W, l+2W, ...`` — at
    flagship geometry that is a near-vertical pixel column, so lanes over a
    glass column draw several 16-bounce paths in a row and the realized max
    lane-iteration count (= the while-loop trip count = wall time) carries a
    heavy tail. A golden-ratio roll per strip spreads each lane's rays across
    the image; rolls are layout transforms (two slices), not gathers.

    MEASURED NEGATIVE on the flagship, default OFF: the roll did not even
    cut the realized max (74 iterations un-rolled vs 80 rolled — the
    vertical stride apparently already crosses object scales at W=131k),
    and it UNIFORMLY scatters the tail's survivors so the masked sweep's
    all-dead-block skip stops firing late in the loop: 9.0 Mpaths/s rolled
    vs 9.9 un-rolled, both exact. ``RTW_PERSIST_ROLL=1`` re-enables for
    A/B runs; see bench_history persist rows."""
    if os.environ.get("RTW_PERSIST_ROLL") == "1":
        return (int(W * 0.381966) | 1)
    return 0


def _u5_for(key, i, rows):
    return jax.random.uniform(jax.random.fold_in(key, 1 << 20 | i),
                              (5, rows, LANES), dtype=jnp.float32)


def _unstrip3(planes, idx3, S, delta, R):
    """Inverse of the per-strip roll layout: gather 3 components whose
    strip planes sit at ``planes[idx3(c, j)]`` back into ``[R, 3]``."""
    return jnp.stack(
        [jnp.concatenate(
            [jnp.roll(planes[idx3(c, j)].reshape(-1), c * delta)
             for c in range(S)])[:R]
         for j in range(3)], axis=-1)


def _warn_dropped(dropped):
    """Surface nonzero dropped-path counts at run time (budget/boundary
    overflow biases the image and gradients low — the same contract and
    warning pattern as the staged paths, render.py). jax.debug.print is a
    host callback the axon PJRT cannot lower, so the warning is elided on
    that platform; audit with persist_dropped_paths there."""
    from ...utils.platform import host_callbacks_unsupported
    if host_callbacks_unsupported():
        return
    jax.lax.cond(
        dropped > 0,
        lambda c: jax.debug.print(
            "WARNING trace_recorded_persist: {} paths dropped (iteration "
            "budget or tail-compact boundary overflow) — radiance and "
            "gradients biased low; raise n_iters / the boundary width or "
            "disable tail_compact", c),
        lambda c: None, dropped)


def _run_record_phase(scene, amat, key, seed, strip_planes, state, rad,
                      rec, rec_idx, counts, i0, cap_abs, max_depth, S,
                      tmin, interpret, fused_step=False):
    """Run persistent record iterations [i0, cap_abs) over the given planes
    (any width). Absolute iteration i seeds the PRNG/u5 streams; buffer slot
    is ``i - i0``. Stops at the realized max (all lanes inactive)."""
    from .intersect_kernel import sweep_masked_planes
    from ..intersect import intersect_spheres
    from ..materials import fetch_attr_planes

    rows = state[0].shape[0]

    def cond(carry):
        return (carry[-1] < cap_abs) & jnp.any(carry[0][11] != 0)

    if fused_step:
        def body(carry):
            state, rad, rec, rec_idx, counts, i = carry
            counts = counts.at[i - i0].set(jnp.sum(state[11]))
            u5 = _u5_for(key, i, rows) if interpret else None
            state, rad, rec = persist_record_fused_step(
                state, rad, rec, strip_planes, scene, i - i0, seed + i,
                max_depth, S, tmin, interpret=interpret, u5=u5)
            return state, rad, rec, rec_idx, counts, i + 1
    else:
        def body(carry):
            state, rad, rec, rec_idx, counts, i = carry
            counts = counts.at[i - i0].set(jnp.sum(state[11]))
            if interpret:
                o = jnp.stack([p.reshape(-1) for p in state[0:3]], axis=-1)
                d = jnp.stack([p.reshape(-1) for p in state[3:6]], axis=-1)
                alive = state[11].reshape(-1)
                res = intersect_spheres(o, d, scene, tmin=tmin)
                hit_t = jnp.where(res.hit & (alive != 0), res.t,
                                  jnp.float32(BIG))
                idx = res.index
                t_plane = hit_t.reshape(rows, LANES)
                attrs10t = amat[idx].T
            else:
                # Plane-native sweep: the state planes feed the kernel
                # directly (no stack-to-[R,3] round trip per iteration).
                t_plane, idx_plane = sweep_masked_planes(
                    state[0:3], state[3:6], state[11], scene.center,
                    scene.radius, tmin)
                idx = idx_plane.reshape(-1)
                attrs10t = fetch_attr_planes(idx, amat, scene.n_spheres)
            attr_planes = [attrs10t[j].reshape(rows, LANES)
                           for j in range(10)]
            u5 = _u5_for(key, i, rows) if interpret else None
            state, rad, rec = persist_record_step(
                state, rad, rec, strip_planes, t_plane, attr_planes,
                i - i0, seed + i, max_depth, S, interpret=interpret, u5=u5)
            rec_idx = rec_idx.at[i - i0].set(idx)
            return state, rad, rec, rec_idx, counts, i + 1

    state, rad, rec, rec_idx, counts, _ = jax.lax.while_loop(
        cond, body,
        (state, rad, rec, rec_idx, counts, jnp.int32(i0)))
    return state, rad, rec, rec_idx, counts


def _zero_rec(n, rows, fused_step=False, rec_attrs=True):
    f32 = jnp.float32
    planes = ([jnp.zeros((n, rows, LANES), f32)] * 10
              + [jnp.zeros((n, rows, LANES), jnp.int32)])
    if rec_attrs:
        planes += [jnp.zeros((n, rows, LANES), f32)] * 10
    if fused_step:
        planes += [jnp.zeros((n, rows, LANES), jnp.int32)]
    return tuple(planes)


@partial(jax.jit, static_argnames=("max_depth", "tmin", "n_strips",
                                   "n_iters", "interpret", "fused_step",
                                   "tail_compact", "rec_attrs"))
def _persist_record_forward(scene, origin, direction, key, max_depth, tmin,
                            n_strips, n_iters, interpret, fused_step=False,
                            tail_compact=None, rec_attrs=True):
    if fused_step and not rec_attrs:
        raise ValueError("rec_attrs=False requires fused_step=False (the "
                         "fused record kernel stores attrs in-kernel)")
    R = origin.shape[0]
    S = n_strips
    rows, W = _strip_geometry(R, S)
    delta = _strip_delta(W)
    f32 = jnp.float32

    def strips(x, dummy):  # [R] -> S rolled [rows, LANES] planes
        xp = jnp.concatenate(
            [x.astype(f32), jnp.full((S * W - R,), dummy, f32)]
        ).reshape(S, W)
        return [jnp.roll(xp[s], -s * delta).reshape(rows, LANES)
                for s in range(S)]

    # Padding rays must be ONE-ITERATION sky paths (output sliced off) so
    # every (strip, lane) slot is a real path and the kernel needs no
    # validity logic. A ray from far below the scene pointing straight down
    # cannot hit any sphere with |center| + radius < 1e7 — every book scene
    # by orders of magnitude. (An origin ray pointing up is NOT safe: in
    # the flagship scene it hits the glass sphere at (0,1,0) and bounces
    # multi-depth, occupying compaction slots.)
    so = [strips(origin[:, j], -1e7 if j == 1 else 0.0) for j in range(3)]
    sd = [strips(direction[:, j], -1.0 if j == 1 else 0.0) for j in range(3)]
    strip_planes = tuple(p for s in range(S)
                         for p in (so[0][s], so[1][s], so[2][s],
                                   sd[0][s], sd[1][s], sd[2][s]))

    izer = jnp.zeros((rows, LANES), jnp.int32)
    ones = jnp.ones((rows, LANES), f32)
    act0 = jnp.ones((rows, LANES), jnp.int32)
    state = (so[0][0], so[1][0], so[2][0], sd[0][0], sd[1][0], sd[2][0],
             ones, ones, ones, izer, izer, act0)
    rad = tuple(jnp.zeros((rows, LANES), f32) for _ in range(3 * S))
    amat = _attr_mat(scene)
    seed = _base_seed(key)

    if tail_compact is not None:
        if fused_step:
            raise ValueError("tail_compact requires fused_step=False")
        b1, wdiv = tail_compact
        b1 = min(b1, n_iters)
        # Phase-2 rows MUST be a whole number of kernel blocks: a remainder
        # would silently fall outside the grid and feed unwritten memory to
        # the replay (caught by the S=12 blown-gradient regression).
        br2 = _persist_block_rows(n_strips)
        rows2 = -(-max(rows // wdiv, br2) // br2) * br2
        W2 = rows2 * LANES
        cap2 = n_iters  # worst case for any surviving lane
    else:
        b1 = n_iters

    rec1 = _zero_rec(b1, rows, fused_step, rec_attrs)
    rec_idx1 = jnp.zeros((b1, W), jnp.int32)
    counts1 = jnp.zeros((b1,), jnp.int32)
    state, rad, rec1, rec_idx1, counts1 = _run_record_phase(
        scene, amat, key, seed, strip_planes, state, rad, rec1, rec_idx1,
        counts1, 0, b1, max_depth, S, tmin, interpret, fused_step)
    if fused_step:
        rec_idx1 = rec1[21].reshape(b1, -1)
        rec1 = rec1[:21]

    def _dummy_future(sp_plane, oy_strips):
        """Per-lane count of UNSTARTED strips holding padding dummies
        (origin.y == -1e7, the documented marker). Dummy rays are
        one-iteration sky paths whose output is sliced off — counting
        them as dropped would inflate the audit and let strict NaN-poison
        a render that lost zero real paths (round-4 review)."""
        cnt = jnp.zeros_like(sp_plane)
        for s_i, oy in enumerate(oy_strips):
            cnt = cnt + ((oy == -1e7) & (sp_plane < s_i)).astype(jnp.int32)
        return cnt

    def _real_inflight(state_):
        # active lanes whose CURRENT ray is not a padding dummy
        return state_[11] * (state_[1] != -1e7).astype(jnp.int32)

    if tail_compact is None:
        radiance = _unstrip3(rad, lambda c, j: 3 * c + j, S, delta, R)
        # Overflow diagnostics (0 unless the caller shrank the cap below
        # the worst case): REAL paths in flight + real strips never
        # started (padding dummies excluded).
        dropped = (jnp.sum(_real_inflight(state))
                   + jnp.sum((S - 1 - state[10])
                             - _dummy_future(state[10], so[1])))
        _warn_dropped(dropped)
        return (radiance.astype(origin.dtype),
                (rec1, rec_idx1, counts1), dropped)

    # ---- boundary: compact the survivors into a W/wdiv wavefront ----
    # One SMALL-OUTPUT gather (unlike the measured-negative full-width
    # permutations): at the default boundary the flagship occupancy is
    # ~5-15%, so phase 2 runs the long tail at 1/wdiv of the sweep cost.
    act_flat = state[11].reshape(-1)
    n_act = jnp.sum(act_flat)
    sel = jnp.nonzero(act_flat, size=W2, fill_value=0)[0]
    valid2 = (jnp.arange(W2, dtype=jnp.int32) < n_act).astype(jnp.int32)

    statef = jnp.stack([p.reshape(-1) for p in state[0:9]])[:, sel]
    statei = jnp.stack([p.reshape(-1) for p in state[9:12]])[:, sel]
    stripsf = jnp.stack([p.reshape(-1) for p in strip_planes])[:, sel]
    state2 = tuple(statef[j].reshape(rows2, LANES) for j in range(9)) + (
        statei[0].reshape(rows2, LANES), statei[1].reshape(rows2, LANES),
        (statei[2] * valid2).reshape(rows2, LANES))
    strip_planes2 = tuple(stripsf[j].reshape(rows2, LANES)
                          for j in range(6 * S))
    rad2 = tuple(jnp.zeros((rows2, LANES), f32) for _ in range(3 * S))
    rec2 = _zero_rec(cap2 - b1, rows2, rec_attrs=rec_attrs)
    rec_idx2 = jnp.zeros((cap2 - b1, W2), jnp.int32)
    counts2 = jnp.zeros((cap2 - b1,), jnp.int32)
    state2, rad2, rec2, rec_idx2, counts2 = _run_record_phase(
        scene, amat, key, seed, strip_planes2, state2, rad2, rec2,
        rec_idx2, counts2, b1, cap2, max_depth, S, tmin, interpret)

    # Scatter phase-2 radiance banks back to the full-width strip planes
    # (each ray banks exactly once, in exactly one phase).
    rad = list(rad)
    v2f = valid2.astype(f32)
    for c in range(3 * S):
        rad[c] = (rad[c].reshape(-1)
                  .at[sel].add(rad2[c].reshape(-1) * v2f)
                  .reshape(rows, LANES))

    radiance = _unstrip3(rad, lambda c, j: 3 * c + j, S, delta, R)

    # Dropped: boundary overflow (survivors beyond W2 never continue:
    # their in-flight path + unstarted strips) + phase-2 cap leftovers —
    # REAL rays only (padding dummies excluded, see _dummy_future).
    selected = jnp.zeros((W,), jnp.int32).at[sel].add(valid2)
    unsel = act_flat * (1 - selected)
    sp_flat = state[10].reshape(-1)  # boundary snapshot (tuples immutable)
    cur_real = (state[1].reshape(-1) != -1e7).astype(jnp.int32)
    fut_dummy = _dummy_future(state[10], so[1]).reshape(-1)
    v2p = valid2.reshape(rows2, LANES)
    oy2_strips = [strip_planes2[6 * s_i + 1] for s_i in range(S)]
    dropped = (jnp.sum(unsel * (cur_real + (S - 1 - sp_flat) - fut_dummy))
               + jnp.sum(_real_inflight(state2) * v2p)
               + jnp.sum(((S - 1 - state2[10])
                          - _dummy_future(state2[10], oy2_strips)) * v2p))
    _warn_dropped(dropped)
    res = (rec1, rec_idx1, counts1, rec2, rec_idx2, counts2, sel, valid2)
    return radiance.astype(origin.dtype), res, dropped


def _strict_drop_poison(radiance, dropped, strict: bool):
    """NaN-poison the radiance when ``strict`` and any path was dropped.

    The drop warning (``_warn_dropped``) is a host callback the primary
    platform cannot lower, so a silently-biased default was possible
    (ADVICE r3, medium). Under ``strict`` the primal — and through its
    cotangents every gradient — becomes NaN on the FIRST step instead,
    which any consumer notices immediately (the grad tripwire names it).
    Free when nothing is dropped; the auto-selected tail-compacted default
    sets it (grad.resolve_grad_path), explicit user configs keep the
    documented bias-low overflow contract."""
    if not strict:
        return radiance
    poison = jnp.where(dropped > 0, jnp.float32(jnp.nan), jnp.float32(1.0))
    return radiance * jax.lax.stop_gradient(poison).astype(radiance.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def trace_recorded_persist(scene, origin, direction, key,
                           max_depth: int = 16, tmin: float = 1e-4,
                           n_strips: int = 8, n_iters: int | None = None,
                           interpret: bool = False, fused_step: bool = False,
                           tail_compact: tuple | None = None,
                           rec_attrs: bool = True, strict: bool = False):
    """Differentiable radiance ``[R, 3]`` — persistent-record kernel-pair
    trace. Forward streams (hardware PRNG, strip refill) differ from
    ``trace``; under ``value_and_grad`` the estimator is exact path replay.
    Rays past the iteration budget read black (overflow contract — see the
    module docstring; use :func:`persist_dropped_paths` to audit), unless
    ``strict`` is set, in which case ANY dropped path NaN-poisons the
    radiance (and therefore the loss and every gradient) — the loud-failure
    mode the auto-selected default uses.
    ``rec_attrs=False`` halves the record footprint (11 slices instead of
    21) by refetching the winner attributes in replay from the recorded
    indices — bitwise the same gradients; slightly more replay compute.
    The pass loop auto-picks it when it avoids pass-level remat."""
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    radiance, _, dropped = _persist_record_forward(
        scene, origin, direction, key, max_depth, tmin, n_strips,
        n_iters, interpret, fused_step, tail_compact, rec_attrs)
    return _strict_drop_poison(radiance, dropped, strict)


def persist_dropped_paths(scene, origin, direction, key, max_depth=16,
                          tmin=1e-4, n_strips=8, n_iters=None,
                          interpret=False, fused_step=False,
                          tail_compact=None, rec_attrs=True):
    """Number of rays dropped by the static iteration budget / boundary
    width (0 = exact; the defaults are exact by construction)."""
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    _, _, dropped = _persist_record_forward(scene, origin, direction, key,
                                            max_depth, tmin, n_strips,
                                            n_iters, interpret, fused_step,
                                            tail_compact, rec_attrs)
    return dropped


def _persist_fwd(scene, origin, direction, key, max_depth, tmin, n_strips,
                 n_iters, interpret, fused_step, tail_compact, rec_attrs,
                 strict):
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    radiance, res, dropped = _persist_record_forward(
        scene, origin, direction, key, max_depth, tmin, n_strips,
        n_iters, interpret, fused_step, tail_compact, rec_attrs)
    radiance = _strict_drop_poison(radiance, dropped, strict)
    return radiance, (scene, key, res, jnp.zeros((0,), origin.dtype),
                      dropped)


def _run_replay_phase(scene, key, seed, rec, rec_idx, counts, grad_strips,
                      cot, dep, g_attr, i0, S, interpret):
    """Reverse-walk one record phase's REALIZED iterations. Buffer slot
    ``slot`` corresponds to absolute iteration ``i0 + slot`` (PRNG/u5
    streams are seeded by the absolute index, exactly as the record
    phase). An 11-slice record (``rec_attrs=False``) carries no attribute
    planes; they are refetched per iteration from the winner indices — the
    identical bit-exact gather the record phase used."""
    from ..materials import fetch_attr_planes
    rows = rec[0].shape[1]
    n = scene.n_spheres
    f32 = jnp.float32
    rec_attrs = len(rec) == 21
    amat = None if rec_attrs else _attr_mat(scene)

    def live_step(carry, slot):
        cot, dep, g_attr = carry
        slot = jnp.asarray(slot, jnp.int32)
        i_abs = i0 + slot
        u5 = _u5_for(key, i_abs, rows) if interpret else None
        if rec_attrs:
            attrs = None
        else:
            idxs = rec_idx[slot]
            attrs10t = amat[idxs].T if interpret \
                else fetch_attr_planes(idxs, amat, n)
            attrs = [attrs10t[j].reshape(rows, LANES) for j in range(10)]
        cot, dep, dattr = persist_replay_step(cot, dep, rec, grad_strips,
                                              slot, seed + i_abs, S,
                                              interpret=interpret, u5=u5,
                                              attrs=attrs)
        g_attr = g_attr + _dattr_contract(
            [p.reshape(-1) for p in dattr], rec_idx[slot], n)
        return cot, dep, g_attr

    realized = jnp.sum((counts > 0).astype(jnp.int32))

    def wcond(carry):
        return carry[0] >= 0

    def wbody(carry):
        slot, inner = carry
        return slot - 1, live_step(inner, slot)

    _, (cot, dep, g_attr) = jax.lax.while_loop(
        wcond, wbody, (realized - 1, (cot, dep, g_attr)))
    return cot, dep, g_attr


def _run_replay_phase_fused(scene, key, seed, rec, rec_idx, counts,
                            grad_strips, cot, dep, g_attr, i0, S, interpret):
    """Fused-replay variant of :func:`_run_replay_phase`: ONE pallas_call
    walks every slot of the phase in reverse (slack slots past the realized
    count carry zero flags and skip in-kernel), then ONE flattened exact
    contraction accumulates the per-sphere attribute cotangents. Requires
    the 21-slice record (``rec_attrs=True``)."""
    del counts  # the in-kernel flag skip subsumes the realized count
    n_slots, rows = rec[0].shape[0], rec[0].shape[1]
    if n_slots == 0:
        return cot, dep, g_attr
    if interpret:
        u5_all = jnp.stack([_u5_for(key, i0 + s, rows)
                            for s in range(n_slots)])
    else:
        u5_all = None
    cot, dep, dattr_all = persist_replay_fused(
        cot, dep, rec, grad_strips, i0, seed, S, interpret=interpret,
        u5_all=u5_all)

    # Contract in static G-slot groups: per-sphere cotangents are SUMMED
    # over slots, so G slots share one dot along the K axis ([27, G*W] @
    # [G*W, n]) — G-fold fewer dot dispatches and one-hot fusions than the
    # per-slot scan, with peak one-hot working set bounded at G x the
    # per-slot one (a single flattened dot over all ~74-128 slots would put
    # ~11 GB of bf16 behind one fusion at flagship scale). G=1 recovers the
    # scan exactly; group order only changes f32 accumulation order
    # (last-ulp, same contract as _dattr_contract's flipped form).
    G = max(_DATTR_GROUP, 1)
    if G == 1:
        def one_slot(g, slot):
            d9 = [jax.lax.dynamic_index_in_dim(p, slot, keepdims=False)
                  .reshape(-1) for p in dattr_all]
            return (g + _dattr_contract(d9, rec_idx[slot], scene.n_spheres),
                    None)

        g_attr, _ = jax.lax.scan(one_slot, g_attr,
                                 jnp.arange(n_slots, dtype=jnp.int32))
        return cot, dep, g_attr
    for s0 in range(0, n_slots, G):
        d9 = [p[s0:s0 + G].reshape(-1) for p in dattr_all]
        idxg = rec_idx[s0:s0 + G].reshape(-1)
        g_attr = g_attr + _dattr_contract(d9, idxg, scene.n_spheres)
    return cot, dep, g_attr




@partial(jax.jit, static_argnames=("max_depth", "tmin", "n_strips",
                                   "n_iters", "interpret", "R",
                                   "tail_compact", "replay_fused"))
def _persist_bwd_impl(scene, key, res, g_rad, max_depth,
                      tmin, n_strips, n_iters, interpret, R,
                      tail_compact=None, replay_fused=False):
    S = n_strips
    n = scene.n_spheres
    f32 = jnp.float32
    seed = _base_seed(key)

    if tail_compact is None:
        rec, rec_idx, counts = res
        sel = valid2 = rec2 = rec_idx2 = counts2 = None
        b1 = n_iters
    else:
        rec, rec_idx, counts, rec2, rec_idx2, counts2, sel, valid2 = res
        b1, _ = tail_compact
        b1 = min(b1, n_iters)
        rows2 = rec2[0].shape[1]
        W2 = rows2 * LANES
    rows = rec[0].shape[1]
    W = rows * LANES
    delta = _strip_delta(W)

    def strips(x):
        xp = jnp.pad(x.astype(f32), (0, S * W - R)).reshape(S, W)
        return [jnp.roll(xp[s], -s * delta).reshape(rows, LANES)
                for s in range(S)]

    gs = [strips(g_rad[:, j]) for j in range(3)]
    grad_strips = tuple(p for c in range(S)
                        for p in (gs[0][c], gs[1][c], gs[2][c]))

    zer = jnp.zeros((rows, LANES), f32)
    cot = (zer,) * 9
    dep = tuple(jnp.zeros((rows, LANES), f32) for _ in range(6 * S))
    g_attr = jnp.zeros((n, 9), f32)

    # Whole-phase fused replay (one pallas_call per phase) when enabled;
    # the lean 11-slice record keeps the per-iteration loop.
    run_phase = (_run_replay_phase_fused
                 if replay_fused and len(rec) == 21 else _run_replay_phase)
    if replay_fused and len(rec) != 21:
        # Surface the silent downgrade (e.g. plan_pass_memory picked the
        # lean record at high spp): a bench row requested as "fused" would
        # otherwise measure the loop replay. Trace-time warning (static).
        import warnings
        warnings.warn("RTW_REPLAY_FUSED requested but the record is the "
                      "lean 11-slice form (rec_attrs=False) — falling back "
                      "to the per-iteration loop replay", stacklevel=2)

    if tail_compact is not None:
        # Phase-2 replay in the compacted space, then transpose the
        # boundary gather: scatter-add the carried cotangents and strip
        # deposits back to full width before the phase-1 replay.
        gsf = jnp.stack([p.reshape(-1) for p in grad_strips])[:, sel]
        grad_strips2 = tuple(gsf[j].reshape(rows2, LANES)
                             for j in range(3 * S))
        z2 = jnp.zeros((rows2, LANES), f32)
        cot2 = (z2,) * 9
        dep2 = tuple(jnp.zeros((rows2, LANES), f32) for _ in range(6 * S))
        cot2, dep2, g_attr = run_phase(
            scene, key, seed, rec2, rec_idx2, counts2, grad_strips2,
            cot2, dep2, g_attr, b1, S, interpret)
        v2f = valid2.astype(f32)
        cot = tuple(c.reshape(-1)
                    .at[sel].add(c2.reshape(-1) * v2f)
                    .reshape(rows, LANES)
                    for c, c2 in zip(cot, cot2))
        dep = tuple(d.reshape(-1)
                    .at[sel].add(d2.reshape(-1) * v2f)
                    .reshape(rows, LANES)
                    for d, d2 in zip(dep, dep2))

    cot, dep, g_attr = run_phase(
        scene, key, seed, rec, rec_idx, counts, grad_strips,
        cot, dep, g_attr, 0, S, interpret)

    # Remaining carried cotangent = strip-0 camera rays.
    dep = list(dep)
    for j in range(6):
        dep[j] = cot[j]
    g_org = _unstrip3(dep, lambda c, j: 6 * c + j, S, delta, R)
    g_dir = _unstrip3(dep, lambda c, j: 6 * c + 3 + j, S, delta, R)
    return g_attr, g_org, g_dir


def _persist_bwd(max_depth, tmin, n_strips, n_iters, interpret, fused_step,
                 tail_compact, rec_attrs, strict, residuals, g_rad):
    if n_iters is None:
        n_iters = default_n_iters(n_strips, max_depth)
    scene, key, res, dtype_token, dropped = residuals
    R, dtype = g_rad.shape[0], dtype_token.dtype
    g_attr, g_org, g_dir = _persist_bwd_impl(scene, key, res,
                                             g_rad.astype(jnp.float32),
                                             max_depth, tmin, n_strips,
                                             n_iters, interpret, R=R,
                                             tail_compact=tail_compact,
                                             replay_fused=_replay_fused_default())
    if strict:
        # Poison the OUTPUT cotangents too: the primal poison alone does
        # not reach gradients when the loss is linear in radiance (the
        # incoming g_rad is then a finite constant and jax.grad discards
        # the NaN primal), which would silently train on biased gradients
        # — the exact failure strict exists to prevent.
        poison = jnp.where(dropped > 0, jnp.float32(jnp.nan),
                           jnp.float32(1.0))
        g_attr = g_attr * poison
        g_org = g_org * poison
        g_dir = g_dir * poison
    g_scene = scene._replace(
        center=g_attr[:, 0:3].astype(scene.center.dtype),
        radius=g_attr[:, 3].astype(scene.radius.dtype),
        albedo=g_attr[:, 4:7].astype(scene.albedo.dtype),
        fuzz=g_attr[:, 7].astype(scene.fuzz.dtype),
        ir=g_attr[:, 8].astype(scene.ir.dtype),
        mat=_float0_like(scene.mat))
    return (g_scene, g_org.astype(dtype), g_dir.astype(dtype),
            _float0_like(key))


trace_recorded_persist.defvjp(_persist_fwd, _persist_bwd)
