"""Second-stage gradient decomposition probe (slope-timed, on device).

Questions the first probe left open:

  A. TRUE record-kernel per-iteration cost — probe 1 measured ~0 because
     its synthetic state died after a few iterations and the kernel's
     in-kernel occupancy skip elided the work. Here the input state is
     re-derived from the live carry each iteration, staying fully alive.
  B. TRUE full step time — probe 1's value_and_grad fetched only the value,
     so XLA DCE'd the whole backward. Here the grad is fetched too.
  C. Can the replay dattr contraction be batched? The per-slot scan costs
     0.315 ms x 74 slots = 23 ms; slots are SUMMED anyway, so G slots can
     share one dot along the K axis — unless XLA materializes the
     [G*W, n] one-hot. Measure G in {1, 4, 8} and flat-over-all-slots.
  D. Where does the record forward's unexplained ~45 ms go? Compare the
     94.7 ms default against tc=None (no boundary gather / phase 2) and
     rec_attrs=False (11 vs 21 record planes: tests the buffer-copy
     hypothesis).

Appends a ``grad_decomp2`` row to bench_history.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.utils.metrics import append_history


def fetch_time(fn, *args, n=5):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.mean(ts))


def slope_time(make_loop, k=32, n=3):
    f1, f2 = jax.jit(make_loop(k)), jax.jit(make_loop(2 * k))
    t1, _ = fetch_time(f1, n=n)
    t2, _ = fetch_time(f2, n=n)
    return max(t2 - t1, 0.0) / k


def main():
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _persist_record_forward, trace_recorded_persist, default_n_iters,
        _strip_geometry, persist_record_step, _zero_rec, LANES)
    from raytracingweekend_jl_tpu.ops.materials import fetch_attr_planes
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
        sweep_masked_planes)
    from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import (
        _attr_mat, _dattr_contract, _split3_bf16_rows)
    from raytracingweekend_jl_tpu.render import image_height_for, pixel_coords
    from raytracingweekend_jl_tpu.camera import get_rays

    dev = jax.devices()[0]
    print("device:", dev)
    W, H, spp = 1920, image_height_for(1920), 1
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    key = jax.random.PRNGKey(7)
    R = W * H * spp
    u, v = pixel_coords(W, H)
    o, d = get_rays(cam, u, v, key)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    S = 8
    tc = (44, 16)
    n_iters = default_n_iters(S, 16)
    rows, _Wl = _strip_geometry(R, S)
    n = scene.n_spheres
    amat = _attr_mat(scene)
    Wlanes = rows * LANES
    print(f"record geometry: rows={rows} lanes={Wlanes} spheres={n} "
          f"n_iters={n_iters}")

    def planes3(x):
        flat = x[: Wlanes]
        return tuple(flat[:, j].reshape(rows, LANES) for j in range(3))

    o3, d3 = planes3(o), planes3(d)
    alive = jnp.ones((rows, LANES), jnp.int32)
    res = {}

    # -- A. record kernel with always-live lanes -----------------------------
    n_slots = 8
    rec0 = _zero_rec(n_slots, rows)
    rad0 = tuple(jnp.zeros((rows, LANES), jnp.float32) for _ in range(3 * S))
    izer = jnp.zeros((rows, LANES), jnp.int32)
    ones = jnp.ones((rows, LANES), jnp.float32)
    act0 = jnp.ones((rows, LANES), jnp.int32)
    strip_planes = tuple(p for _ in range(S) for p in (*o3, *d3))
    t_pl0, idx_pl0 = jax.jit(lambda: sweep_masked_planes(
        o3, d3, alive, scene.center, scene.radius, 1e-4))()
    attrs10 = jax.jit(lambda ix: fetch_attr_planes(ix, amat, n))(
        idx_pl0.reshape(-1))
    attr_planes0 = [attrs10[j].reshape(rows, LANES) for j in range(10)]

    def mk_record(k):
        def run():
            def body(i, carry):
                rad, rec, tok = carry
                # Fresh fully-live state each iteration, data-dependent on
                # the carry so iterations can't be CSE'd; bounce/active
                # start at 0/1 so the kernel never hits its skip path.
                state = (o3[0] + tok, o3[1], o3[2], d3[0], d3[1], d3[2],
                         ones, ones, ones, izer, izer, act0)
                state, rad, rec = persist_record_step(
                    state, rad, rec, strip_planes, t_pl0, attr_planes0,
                    i % n_slots, i, 16, S)
                return rad, rec, tok + 1e-9 * jnp.sum(state[6][0, :8])
            rad, rec, tok = jax.lax.fori_loop(
                0, k, body, (rad0, rec0, jnp.float32(0)))
            return jnp.sum(rad[0]) + jnp.sum(rec[0][0]) + tok
        return run

    res["record_kernel_live_ms"] = slope_time(mk_record, k=16) * 1e3
    print(f"record kernel/iter (live): {res['record_kernel_live_ms']:.3f} ms")

    # -- C. dattr contraction batching ---------------------------------------
    dattr9 = [jax.random.normal(jax.random.fold_in(key, j),
                                (Wlanes,), jnp.float32) for j in range(9)]
    idx0 = jax.random.randint(key, (Wlanes,), 0, n, jnp.int32)

    def contract_group(d9g, idxg, g):
        """G slots, one dot along K: d9g = 9 arrays [G*W], idxg [G*W]."""
        rows9t = jnp.stack(d9g, axis=0)                  # [9, G*W]
        rows27t = _split3_bf16_rows(rows9t)              # [27, G*W]
        onehot = (idxg[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
                  ).astype(jnp.bfloat16)                 # [G*W, n]
        c = jax.lax.dot_general(rows27t, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (c[0:9] + c[9:18] + c[18:27]).T           # [n, 9]

    for G in (1, 4, 8):
        d9g = [jnp.tile(p, (G,)) for p in dattr9]
        idxg = jnp.tile(idx0, (G,))

        def mk_con(k, d9g=d9g, idxg=idxg, G=G):
            def run():
                def body(i, carry):
                    ix, acc = carry
                    gr = contract_group(d9g, ix, G)
                    ix = (ix + jnp.int32(1)
                          + (gr[0, 0].astype(jnp.int32) & 0)) % n
                    return ix, acc + jnp.sum(gr)
                _, acc = jax.lax.fori_loop(0, k, body, (idxg, jnp.float32(0)))
                return acc
            return run

        per_slot = slope_time(mk_con, k=16) * 1e3 / G
        res[f"contract_g{G}_ms_per_slot"] = per_slot
        print(f"contract G={G}: {per_slot:.3f} ms/slot "
              f"(74 slots -> {74 * per_slot:.1f} ms)")

    # -- D. record forward variants ------------------------------------------
    def fwd_fn(tc_, rec_attrs, n_it):
        return jax.jit(lambda s: jnp.sum(_persist_record_forward(
            s, o, d, key, 16, 1e-4, S, n_it, False, False, tc_,
            rec_attrs)[0][0]))

    f_min, _ = fetch_time(fwd_fn(tc, True, n_iters), scene)
    res["fwd_default_ms"] = f_min * 1e3
    print(f"record fwd default: {f_min*1e3:.1f} ms")

    f_min, _ = fetch_time(fwd_fn(None, True, n_iters), scene)
    res["fwd_no_tc_ms"] = f_min * 1e3
    print(f"record fwd tc=None: {f_min*1e3:.1f} ms")

    f_min, _ = fetch_time(fwd_fn(tc, False, n_iters), scene)
    res["fwd_lean_ms"] = f_min * 1e3
    print(f"record fwd lean(11-slice): {f_min*1e3:.1f} ms")

    f_min, _ = fetch_time(fwd_fn((44, 16), True, 48), scene)
    res["fwd_it48_ms"] = f_min * 1e3
    print(f"record fwd n_iters=48: {f_min*1e3:.1f} ms")

    # -- B. true full step (value AND grads fetched) -------------------------
    def loss(s):
        rad = trace_recorded_persist(s, o, d, key, 16, 1e-4, S, n_iters,
                                     False, False, tc)
        return jnp.mean(rad * rad)

    def step(s):
        val, g = jax.value_and_grad(loss, allow_int=True)(s)
        return (val + jnp.sum(g.albedo) + jnp.sum(g.center)
                + jnp.sum(g.radius) + jnp.sum(g.fuzz) + jnp.sum(g.ir))

    s_min, s_mean = fetch_time(jax.jit(step), scene)
    res["step_ms"] = s_min * 1e3
    res["step_mpaths_per_s"] = R / s_min / 1e6
    print(f"full step: min {s_min*1e3:.1f} ms "
          f"({res['step_mpaths_per_s']:.2f} Mpaths/s)")
    res["replay_ms"] = res["step_ms"] - res["fwd_default_ms"]
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=2))

    rec = {"ts": time.time(), "label": "grad_decomp2_1920x1080x1",
           "device": str(dev)}
    rec.update({k: round(v, 4) for k, v in res.items()})
    append_history(rec, os.path.join(os.path.dirname(__file__), "..",
                                     "bench_history.jsonl"))


if __name__ == "__main__":
    main()
