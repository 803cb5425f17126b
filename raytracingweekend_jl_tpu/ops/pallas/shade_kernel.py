"""Fused shade + regenerate Pallas kernel — one pass over persistent state.

In the persistent-wavefront loop (ops/integrator.persistent_render_sum) the
non-sweep work — sky accumulation, normal/material math, per-ray RNG, state
masking, and camera regeneration — lowers to dozens of small XLA fusions that
re-read and re-write the multi-hundred-MB wavefront state every bounce; at
flagship sizes that costs more than the sphere sweep itself. This kernel fuses
the ENTIRE post-sweep iteration body into one Pallas pass: state is read once
into VMEM, shaded, regenerated, and written once (in-place via
input/output aliasing).

RNG: the TPU hardware PRNG (``pltpu.prng_seed``/``prng_random_bits``), seeded
per (block, iteration) — per-lane draws are positional, which in the
persistent design is equivalent to slot-keyed (lanes are pinned to pixels and
never reordered). Streams differ from the threefry path, so images match the
XLA persistent path *statistically*; RNG-free paths (fuzz-0 mirror chains,
aperture-0 centered samples) match exactly. Distribution checks live in
tests/test_shade_kernel.py.

Material/semantic math is a line-for-line twin of ops/materials.scatter and
the regen logic of persistent_render_sum (reference semantics cited there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..intersect import BIG
from .intersect_kernel import LANES, _pad_rows

#: Rays per program instance for the shade pass (env-tunable like BLOCK_ROWS).
SHADE_ROWS = int(os.environ.get("RTW_SHADE_ROWS", "64"))

_TWO_PI = 2.0 * np.pi


def _uniforms(shape, n):
    """n independent U[0,1) float32 fields of `shape` from the core PRNG."""
    # prng_random_bits yields SIGNED int32: a bare arithmetic shift
    # sign-extends and half the mass lands in [-0.5, 0) (observed as a ~1%
    # radiance bias). Mosaic cannot cast uint32->f32, so shift signed and mask
    # to the low 24 bits (== logical shift), then cast int32->f32 exactly.
    bits = pltpu.prng_random_bits((n,) + shape)
    b24 = jax.lax.bitwise_and(bits >> 8, jnp.int32(0xFFFFFF))
    return b24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _gauss3(u0, u1, u2, u3):
    """3 standard normals via Box-Muller from 4 uniforms."""
    tiny = jnp.float32(1e-12)
    r0 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u0, tiny)))
    r1 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u2, tiny)))
    a0 = jnp.float32(_TWO_PI) * u1
    a1 = jnp.float32(_TWO_PI) * u3
    return r0 * jnp.cos(a0), r0 * jnp.sin(a0), r1 * jnp.cos(a1)


def _concentric(u, v):
    """Shirley's concentric square->disk map (see ops/sampling.py)."""
    a = 2.0 * u - 1.0
    b = 2.0 * v - 1.0
    use_a = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(use_a, a, b)
    qp = jnp.float32(np.pi / 4)
    hp = jnp.float32(np.pi / 2)
    safe_a = jnp.where(a == 0, 1.0, a)
    safe_b = jnp.where(b == 0, 1.0, b)
    theta = jnp.where(use_a, qp * (b / safe_a), hp - qp * (a / safe_b))
    theta = jnp.where((a == 0) & (b == 0), 0.0, theta)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _shade_kernel(cam_ref, iter_ref, lim_ref,  # scalar prefetch: cam consts, seed, last_sample
                  *refs, max_depth: int, tmin: float, hw_prng: bool):
    # Unpack refs: [u9?] + 11 hit + 2 film + 15 state-in + 15 state-out.
    if hw_prng:
        u9_ref = None
    else:
        u9_ref, refs = refs[0], refs[1:]
    (t_ref, acx_ref, acy_ref, acz_ref, ar_ref, aar_ref, aag_ref,
     aab_ref, afz_ref, air_ref, amt_ref,
     fu_ref, fv_ref,
     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     tx_ref, ty_ref, tz_ref, rx_ref, ry_ref, rz_ref,
     bo_ref, sa_ref, ac_ref,
     oxo, oyo, ozo, dxo, dyo, dzo, txo, tyo, tzo, rxo, ryo, rzo,
     boo, sao, aco) = refs
    if hw_prng:
        # Decorrelate blocks and iterations.
        pltpu.prng_seed(iter_ref[0] + pl.program_id(0) * jnp.int32(40503))

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tx, ty, tz = tx_ref[:], ty_ref[:], tz_ref[:]
    rx, ry, rz = rx_ref[:], ry_ref[:], rz_ref[:]
    bo, sa, ac = bo_ref[:], sa_ref[:], ac_ref[:]
    u9 = _uniforms(ox.shape, 9) if hw_prng else u9_ref[:]
    attrs_vals = (acx_ref[:], acy_ref[:], acz_ref[:], ar_ref[:], aar_ref[:],
                  aag_ref[:], aab_ref[:], afz_ref[:], air_ref[:], amt_ref[:])
    out = _shade_math(cam_ref, lim_ref[0], u9, t_ref[:], attrs_vals,
                      fu_ref[:], fv_ref[:],
                      (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, bo, sa, ac),
                      max_depth)
    for ref, val in zip((oxo, oyo, ozo, dxo, dyo, dzo, txo, tyo, tzo, rxo,
                         ryo, rzo, boo, sao, aco), out):
        ref[:] = val


def _shade_core(u9, t, attrs_vals, ox, oy, oz, dx, dy, dz, tx, ty, tz,
                rx, ry, rz, active):
    """Sky + hit geometry + all three materials, shared by every kernel
    variant. Returns (rx, ry, rz with sky added, hitm, miss, hit point p,
    new scatter direction nd, attenuation a)."""
    (acx, acy, acz, arr, aar, aag, aab, afz, air, amt) = attrs_vals

    hitm = (t < jnp.float32(BIG)) & active
    miss = active & ~hitm

    # --- sky on miss (reference: src/ray_color.jl:1-6,35-37) ---
    st = 0.5 * (dy + 1.0)
    skyr = (1.0 - st) + st * 0.5
    skyg = (1.0 - st) + st * 0.7
    skyb = (1.0 - st) + st * 1.0
    mf = miss.astype(jnp.float32)
    rx = rx + mf * tx * skyr
    ry = ry + mf * ty * skyg
    rz = rz + mf * tz * skyb

    # --- hit point + normal (reference: src/hit.jl:3,6-10,32-34) ---
    ts = jnp.where(hitm, t, 1.0)
    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz
    cx, cy, cz = acx, acy, acz
    rad_s = arr
    inv_r = jnp.where(rad_s == 0, 0.0, 1.0 / jnp.where(rad_s == 0, 1.0, rad_s))
    nx = (px - cx) * inv_r
    ny = (py - cy) * inv_r
    nz = (pz - cz) * inv_r
    ddn = dx * nx + dy * ny + dz * nz
    front = ddn < 0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    g0, g1, g2 = _gauss3(u9[0], u9[1], u9[2], u9[3])
    gn = jax.lax.rsqrt(jnp.maximum(g0 * g0 + g1 * g1 + g2 * g2, 1e-20))
    ux, uy, uz = g0 * gn, g1 * gn, g2 * gn
    xi = u9[4]

    # --- Lambertian (src/material.jl:13-23) ---
    lx, ly, lz = nx + ux, ny + uy, nz + uz
    lsq = lx * lx + ly * ly + lz * lz
    degen = lsq < 1e-5
    lno = jax.lax.rsqrt(jnp.maximum(lsq, 1e-20))
    lamx = jnp.where(degen, nx, lx * lno)
    lamy = jnp.where(degen, ny, ly * lno)
    lamz = jnp.where(degen, nz, lz * lno)

    # --- Metal (src/material.jl:25-34) ---
    dn = dx * nx + dy * ny + dz * nz
    refx = dx - 2.0 * dn * nx
    refy = dy - 2.0 * dn * ny
    refz = dz - 2.0 * dn * nz
    fz = afz
    mx, my, mz = refx + fz * ux, refy + fz * uy, refz + fz * uz
    mno = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-20))
    metx, mety, metz = mx * mno, my * mno, mz * mno

    # --- Dielectric (src/material.jl:41-53, src/light.jl:12-25) ---
    irv = air
    safe_ir = jnp.where(irv == 0, 1.0, irv)
    eta = jnp.where(front, 1.0 / safe_ir, safe_ir)
    cos_t = jnp.minimum(-(dx * nx + dy * ny + dz * nz), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = eta * sin_t > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    omc = 1.0 - cos_t
    omc2 = omc * omc
    schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
    choose_reflect = cannot | (schlick > xi)
    # refract (src/light.jl:12-17)
    rpx = eta * (dx + cos_t * nx)
    rpy = eta * (dy + cos_t * ny)
    rpz = eta * (dz + cos_t * nz)
    par = -jnp.sqrt(jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)))
    fx, fy, fzz = rpx + par * nx, rpy + par * ny, rpz + par * nz
    fno = jax.lax.rsqrt(jnp.maximum(fx * fx + fy * fy + fzz * fzz, 1e-20))
    dielx = jnp.where(choose_reflect, refx, fx * fno)
    diely = jnp.where(choose_reflect, refy, fy * fno)
    dielz = jnp.where(choose_reflect, refz, fzz * fno)

    # --- dispatch on material code (0 lambert / 1 metal / 2 dielectric) ---
    mt = amt
    is_lam = mt == 0
    is_met = mt == 1
    ndx = jnp.where(is_lam, lamx, jnp.where(is_met, metx, dielx))
    ndy = jnp.where(is_lam, lamy, jnp.where(is_met, mety, diely))
    ndz = jnp.where(is_lam, lamz, jnp.where(is_met, metz, dielz))

    return (rx, ry, rz, hitm, miss, px, py, pz, ndx, ndy, ndz,
            aar, aag, aab)


def _shade_math(cam_ref, lim_val, u9, t, attrs_vals, fu, fv, state_vals,
                max_depth: int):
    """Value-level shade+regen body shared by the standalone shade kernel and
    the all-in-one megakernel (mega_kernel.py): the shading core plus
    same-pixel bookkeeping and regeneration. Returns the 15 updated state
    planes as values."""
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, bo, sa, ac) = state_vals
    active = ac != 0
    (rx, ry, rz, hitm, miss, px, py, pz, ndx, ndy, ndz, aar, aag, aab) = \
        _shade_core(u9, t, attrs_vals, ox, oy, oz, dx, dy, dz, tx, ty, tz,
                    rx, ry, rz, active)

    # --- continue / exhaust / regen bookkeeping ---
    newb = bo + 1
    cont = hitm & (newb < max_depth)
    exhausted = hitm & ~cont
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

    # --- regenerate: same pixel, next sample, in place ---
    need = miss | exhausted
    nxt = sa + 1
    can = need & (nxt <= lim_val)
    # camera constants
    cam = cam_ref
    o0x, o0y, o0z = cam[0], cam[1], cam[2]
    llx, lly, llz = cam[3], cam[4], cam[5]
    hx, hy, hz = cam[6], cam[7], cam[8]
    vx, vy, vz = cam[9], cam[10], cam[11]
    cux, cuy, cuz = cam[12], cam[13], cam[14]
    cvx, cvy, cvz = cam[15], cam[16], cam[17]
    lensr = cam[18]
    inv_w, inv_h = cam[19], cam[20]

    centered = nxt == 0
    ju = jnp.where(centered, 0.0, u9[5] * inv_w)
    jv = jnp.where(centered, 0.0, u9[6] * inv_h)
    s_f = fu + ju
    t_f = fv + jv
    da, db = _concentric(u9[7], u9[8])
    rdx, rdy = lensr * da, lensr * db
    offx = rdx * cux + rdy * cvx
    offy = rdx * cuy + rdy * cvy
    offz = rdx * cuz + rdy * cvz
    gox, goy, goz = o0x + offx, o0y + offy, o0z + offz
    gdx = llx + s_f * hx + t_f * vx - o0x - offx
    gdy = lly + s_f * hy + t_f * vy - o0y - offy
    gdz = llz + s_f * hz + t_f * vz - o0z - offz
    gno = jax.lax.rsqrt(jnp.maximum(gdx * gdx + gdy * gdy + gdz * gdz, 1e-20))
    gdx, gdy, gdz = gdx * gno, gdy * gno, gdz * gno

    canf = can.astype(jnp.float32)
    nanf = 1.0 - canf
    ox = canf * gox + nanf * ox
    oy = canf * goy + nanf * oy
    oz = canf * goz + nanf * oz
    dx = canf * gdx + nanf * dx
    dy = canf * gdy + nanf * dy
    dz = canf * gdz + nanf * dz
    tx = jnp.where(can, 1.0, tx)
    ty = jnp.where(can, 1.0, ty)
    tz = jnp.where(can, 1.0, tz)
    bo = jnp.where(can, 0, bo)
    sa = jnp.where(can, nxt, sa)
    active = (active & ~need) | can

    return (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, bo, sa,
            active.astype(jnp.int32))


def shade_and_regen(state: tuple, t: jnp.ndarray, attrs10t: jnp.ndarray,
                    film_u: jnp.ndarray, film_v: jnp.ndarray,
                    cam_consts: jnp.ndarray, iteration, last_sample,
                    max_depth: int, tmin: float,
                    interpret: bool = False,
                    rng_u9: jnp.ndarray | None = None) -> tuple:
    """One fused post-sweep iteration over the persistent state.

    ``state`` = 15 [R] planes (ox..oz, dx..dz, thr3, rad3, bounce, sample,
    active); ``attrs10t`` = [10,R] winning-sphere attribute rows
    (plane-major — materials._onehot_cols_exact layout);
    ``cam_consts`` = [21] packed camera scalars + 1/W, 1/H. Returns the
    updated 15 planes.
    """
    R = t.shape[0]
    rows = -(-R // LANES)
    rows = -(-rows // SHADE_ROWS) * SHADE_ROWS
    grid = rows // SHADE_ROWS

    pad2 = lambda x: _pad_rows(x, rows)
    hw_prng = rng_u9 is None
    rng_planes = []
    rng_specs = []
    if not hw_prng:
        u9p = jnp.stack([pad2(rng_u9[i]) for i in range(9)])  # [9, rows, LANES]
        rng_planes = [u9p]
        rng_specs = [pl.BlockSpec((9, SHADE_ROWS, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
    hit_planes = [pad2(t)] + [pad2(attrs10t[i]) for i in range(10)]
    film_planes = [pad2(film_u), pad2(film_v)]
    state_planes = [pad2(s) for s in state]

    f32 = jnp.float32
    spec = lambda dt_: pl.BlockSpec((SHADE_ROWS, LANES), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)
    n_in = len(hit_planes) + len(film_planes) + len(state_planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=rng_specs + [spec(None)] * n_in,
        out_specs=[spec(None)] * 15,
    )
    out_shapes = ([jax.ShapeDtypeStruct((rows, LANES), f32)] * 12
                  + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 3)
    # Alias the 15 state inputs (positions after scalars+hit+film inputs) to
    # the 15 outputs: true in-place update.
    first_state = 3 + len(rng_planes) + len(hit_planes) + len(film_planes)
    aliases = {first_state + i: i for i in range(15)}

    outs = pl.pallas_call(
        partial(_shade_kernel, max_depth=max_depth, tmin=tmin, hw_prng=hw_prng),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(cam_consts, jnp.asarray(iteration, jnp.int32).reshape(1,),
      jnp.asarray(last_sample, jnp.int32).reshape(1,),
      *rng_planes, *hit_planes, *film_planes, *state_planes)
    return tuple(o.reshape(-1)[:R] for o in outs)


def pack_camera_consts(cam, image_width: int, image_height: int) -> jnp.ndarray:
    """[21] float32: origin, lower_left, horizontal, vertical, u, v,
    lens_radius, 1/W, 1/H (reference camera frame, src/camera.jl:1-10)."""
    return jnp.concatenate([
        cam.origin.astype(jnp.float32), cam.lower_left_corner.astype(jnp.float32),
        cam.horizontal.astype(jnp.float32), cam.vertical.astype(jnp.float32),
        cam.u.astype(jnp.float32), cam.v.astype(jnp.float32),
        jnp.asarray([cam.lens_radius, 1.0 / np.float32(image_width),
                     1.0 / np.float32(image_height)], jnp.float32),
    ])


# ---------------------------------------------------------------------------
# Strided multi-pixel shade+regen (load-balanced persistent lanes)
# ---------------------------------------------------------------------------
#
# Pixel-pinned lanes straggle: a glass/metal pixel's mean path length (~14
# bounces) is ~3x the scene average, so with one pixel per lane the while loop
# runs until the SLOWEST pixel finishes all its samples and overall occupancy
# collapses to ~40% (xprof round-1). Here each lane owns ``k`` pixels spaced
# ``R_lanes`` apart across the image (different rows => decorrelated
# workloads): when a pixel's samples are done the lane folds its accumulator
# into the per-strip buffer and *switches pixels in place*. Per-lane work is
# the MEAN over k pixels, shrinking the straggler gap ~sqrt(k)-fold.

def _shade_strided_kernel(cam_ref, iter_ref, lim_ref, geom_ref,
                          *refs, max_depth: int, hw_prng: bool, k: int):
    if hw_prng:
        u9_ref = None
    else:
        u9_ref, refs = refs[0], refs[1:]
    n_state = 19 + 3 * k
    in_refs = refs[:11 + n_state]
    out_refs = refs[11 + n_state:]
    (t_ref, acx_ref, acy_ref, acz_ref, ar_ref, aar_ref, aag_ref,
     aab_ref, afz_ref, air_ref, amt_ref) = in_refs[:11]
    st_in = in_refs[11:]

    if hw_prng:
        pltpu.prng_seed(iter_ref[0] + pl.program_id(0) * jnp.int32(40503))

    ox, oy, oz = st_in[0][:], st_in[1][:], st_in[2][:]
    dx, dy, dz = st_in[3][:], st_in[4][:], st_in[5][:]
    tx, ty, tz = st_in[6][:], st_in[7][:], st_in[8][:]
    cx_, cy_, cz_ = st_in[9][:], st_in[10][:], st_in[11][:]  # cur accumulator
    bo, sa, strip = st_in[12][:], st_in[13][:], st_in[14][:]
    pxi, pyi, ac = st_in[15][:], st_in[16][:], st_in[17][:]
    # Per-lane last-sample id: lanes may own different sample slices of their
    # pixel (sample_groups folding), so the limit is a plane, not a scalar.
    lane_lim = st_in[18][:]
    bufs = [st_in[19 + i][:] for i in range(3 * k)]
    active = ac != 0

    u9 = _uniforms(ox.shape, 9) if hw_prng else u9_ref[:]
    attrs_vals = (acx_ref[:], acy_ref[:], acz_ref[:], ar_ref[:], aar_ref[:],
                  aag_ref[:], aab_ref[:], afz_ref[:], air_ref[:], amt_ref[:])
    (cx_, cy_, cz_, hitm, miss, px, py, pz, ndx, ndy, ndz, aar, aag, aab) = \
        _shade_core(u9, t_ref[:], attrs_vals, ox, oy, oz, dx, dy, dz,
                    tx, ty, tz, cx_, cy_, cz_, active)

    # continue bouncing
    newb = bo + 1
    cont = hitm & (newb < max_depth)
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

    # ray finished: next sample of this lane's slice, or switch pixels
    need = miss | (hitm & ~cont)
    first_sample = lim_ref[1]
    nxt = sa + 1
    same_pix = need & (nxt <= lane_lim)
    done_pix = need & ~same_pix

    # fold the finished pixel's accumulator into its strip buffer
    for c in range(k):
        m = done_pix & (strip == c)
        mfold = m.astype(jnp.float32)
        bufs[3 * c + 0] = bufs[3 * c + 0] + mfold * cx_
        bufs[3 * c + 1] = bufs[3 * c + 1] + mfold * cy_
        bufs[3 * c + 2] = bufs[3 * c + 2] + mfold * cz_
    keepf = 1.0 - done_pix.astype(jnp.float32)
    cx_, cy_, cz_ = cx_ * keepf, cy_ * keepf, cz_ * keepf

    # advance pixel coordinates by R_lanes (dpx/dpy precomputed, carry exact)
    W = geom_ref[0]
    Hm1 = geom_ref[1] - 1
    dpx = geom_ref[2]
    dpy = geom_ref[3]
    p_end = geom_ref[4]  # one past the last pixel id this tile may render
    npx = pxi + dpx
    carry = (npx >= W).astype(jnp.int32)
    npx = npx - W * carry
    npy = pyi + dpy + carry
    new_strip = strip + 1
    pxi = jnp.where(done_pix, npx, pxi)
    pyi = jnp.where(done_pix, npy, pyi)
    strip = jnp.where(done_pix, new_strip, strip)
    sa = jnp.where(done_pix, first_sample, jnp.where(same_pix, nxt, sa))
    # Valid next pixel: inside this tile's contiguous row-major range (for the
    # full image p_end = W*H, reducing to the old npy <= H-1 check).
    valid_new = (npy * W + npx) < p_end
    start = same_pix | (done_pix & (new_strip < k) & valid_new)

    # camera ray for starting lanes (film coords from integer pixel coords)
    cam = cam_ref
    inv_w, inv_h = cam[19], cam[20]
    u_f = (pxi + 1).astype(jnp.float32) * inv_w
    v_f = (Hm1 - pyi).astype(jnp.float32) * inv_h
    centered = sa == 0
    ju = jnp.where(centered, 0.0, u9[5] * inv_w)
    jv = jnp.where(centered, 0.0, u9[6] * inv_h)
    s_f = u_f + ju
    t_f = v_f + jv
    da, db = _concentric(u9[7], u9[8])
    rdx, rdy = cam[18] * da, cam[18] * db
    offx = rdx * cam[12] + rdy * cam[15]
    offy = rdx * cam[13] + rdy * cam[16]
    offz = rdx * cam[14] + rdy * cam[17]
    gox, goy, goz = cam[0] + offx, cam[1] + offy, cam[2] + offz
    gdx = cam[3] + s_f * cam[6] + t_f * cam[9] - cam[0] - offx
    gdy = cam[4] + s_f * cam[7] + t_f * cam[10] - cam[1] - offy
    gdz = cam[5] + s_f * cam[8] + t_f * cam[11] - cam[2] - offz
    gno = jax.lax.rsqrt(jnp.maximum(gdx * gdx + gdy * gdy + gdz * gdz, 1e-20))
    stf = start.astype(jnp.float32)
    nstf = 1.0 - stf
    ox = stf * gox + nstf * ox
    oy = stf * goy + nstf * oy
    oz = stf * goz + nstf * oz
    dx = stf * (gdx * gno) + nstf * dx
    dy = stf * (gdy * gno) + nstf * dy
    dz = stf * (gdz * gno) + nstf * dz
    tx = jnp.where(start, 1.0, tx)
    ty = jnp.where(start, 1.0, ty)
    tz = jnp.where(start, 1.0, tz)
    bo = jnp.where(start, 0, bo)
    active = (active & ~need) | start

    out_vals = ([ox, oy, oz, dx, dy, dz, tx, ty, tz, cx_, cy_, cz_,
                 bo, sa, strip, pxi, pyi, active.astype(jnp.int32), lane_lim]
                + bufs)
    for ref, val in zip(out_refs, out_vals):
        ref[:] = val


def shade_strided_step(state: tuple, t: jnp.ndarray, attrs10t: jnp.ndarray,
                       cam_consts: jnp.ndarray, geom: jnp.ndarray,
                       iteration, last_sample, first_sample,
                       max_depth: int, k: int,
                       interpret: bool = False,
                       rng_u9: jnp.ndarray | None = None) -> tuple:
    """One strided shade+regen iteration over pre-padded (rows,128) planes."""
    rows = state[0].shape[0]
    grid = rows // SHADE_ROWS
    hw_prng = rng_u9 is None

    spec = pl.BlockSpec((SHADE_ROWS, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    rng_specs, rng_planes = [], []
    if not hw_prng:
        rng_planes = [rng_u9]
        rng_specs = [pl.BlockSpec((9, SHADE_ROWS, LANES),
                                  lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    pad2 = lambda x: _pad_rows(x, rows)
    hit_planes = [pad2(t)] + [pad2(attrs10t[i]) for i in range(10)]

    n_state = len(state)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=rng_specs + [spec] * (11 + n_state),
        out_specs=[spec] * n_state,
    )
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((rows, LANES),
                                       s_.dtype) for s_ in state]
    first_state = 4 + len(rng_planes) + 11
    aliases = {first_state + i: i for i in range(n_state)}

    outs = pl.pallas_call(
        partial(_shade_strided_kernel, max_depth=max_depth, hw_prng=hw_prng,
                k=(n_state - 19) // 3),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(cam_consts, jnp.asarray(iteration, jnp.int32).reshape(1,),
      jnp.asarray([last_sample, first_sample], jnp.int32), geom,
      *rng_planes, *hit_planes, *state)
    return tuple(outs)
