"""On-device decomposition probe for the persistent-record gradient step.

The round-3 version timed single dispatches with ``block_until_ready`` —
worthless on the axon tunnel (dispatch returns before device completion;
a host *fetch* is the only true sync, and one dispatch costs ~15-30 ms
RTT, drowning sub-ms ops). This version times every per-iteration
component by SLOPE: run the component K and 2K times inside ONE jitted
``lax.fori_loop`` (data-dependent carry so XLA cannot CSE/DCE the
iterations), host-fetch a scalar, and report ``(t_2K - t_K) / K``.

Measured at flagship record geometry (one 2.07M-ray chunk, S=8 strips,
rows=2048 x LANES=128 planes):

  1. masked sweep kernel            (per record iteration)
  2. MXU one-hot attribute fetch    (per record iteration)
  3. persist record kernel          (per record iteration)
  4. replay dattr one-hot contraction (per replay slot)
  5. whole record forward / whole value_and_grad step (host-fetch timed;
     these are >100 ms, so RTT is a small correction)

Purpose: locate the remaining non-sweep record time and decide whether a
Pallas in-kernel one-hot (record side) or an in-kernel dattr accumulation
(replay side) is worth building. Appends a ``grad_decomp`` row to
bench_history.jsonl.
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
    """min/mean wall seconds across n calls, each synced by a host fetch."""
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.mean(ts))


def slope_time(make_loop, k=32, n=3):
    """Per-iteration device seconds via the (2K - K) slope, min over n."""
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
        _attr_mat, _dattr_contract)
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
    rows, Wl = _strip_geometry(R, S)
    n = scene.n_spheres
    amat = _attr_mat(scene)
    print(f"record geometry: rows={rows} lanes/plane={rows * LANES} "
          f"spheres={n}")

    # Realistic plane inputs: the first 1/S of the rays, plane-shaped.
    def planes3(x):
        flat = x[: rows * LANES]
        return tuple(flat[:, j].reshape(rows, LANES) for j in range(3))

    o3, d3 = planes3(o), planes3(d)
    alive = jnp.ones((rows, LANES), jnp.int32)

    res = {}

    # -- 1. sweep kernel per iteration (full-width head) --------------------
    def mk_sweep(k):
        def run():
            def body(i, carry):
                oy, acc = carry
                t_pl, idx_pl = sweep_masked_planes(
                    (o3[0], oy, o3[2]), d3, alive, scene.center,
                    scene.radius, 1e-4)
                # carry depends on output; perturb an input so iterations
                # cannot be collapsed.
                return oy + 1e-7 * t_pl, acc + jnp.sum(idx_pl)
            _, acc = jax.lax.fori_loop(0, k, body, (o3[1], jnp.float32(0)))
            return acc
        return run

    res["sweep_ms"] = slope_time(mk_sweep) * 1e3
    print(f"sweep/iter: {res['sweep_ms']:.3f} ms")

    # -- 2. one-hot attr fetch per iteration ---------------------------------
    idx0 = jax.random.randint(key, (rows * LANES,), 0, n, jnp.int32)

    def mk_fetch(k):
        def run():
            def body(i, carry):
                ix, acc = carry
                a10 = fetch_attr_planes(ix, amat, n)
                # next index depends on this fetch (prevents batching)
                ix = (ix + jnp.int32(1)
                      + (a10[0].astype(jnp.int32) & 0)) % n
                return ix, acc + jnp.sum(a10[1])
            _, acc = jax.lax.fori_loop(0, k, body, (idx0, jnp.float32(0)))
            return acc
        return run

    res["onehot_fetch_ms"] = slope_time(mk_fetch) * 1e3
    print(f"one-hot fetch/iter: {res['onehot_fetch_ms']:.3f} ms")

    # -- 3. record kernel per iteration --------------------------------------
    n_slots = 8  # small slot buffer; cost per iteration is slot-independent
    rec0 = _zero_rec(n_slots, rows)
    rad0 = tuple(jnp.zeros((rows, LANES), jnp.float32) for _ in range(3 * S))
    izer = jnp.zeros((rows, LANES), jnp.int32)
    ones = jnp.ones((rows, LANES), jnp.float32)
    state0 = (o3[0], o3[1], o3[2], d3[0], d3[1], d3[2],
              ones, ones, ones, izer, izer, jnp.ones((rows, LANES),
                                                     jnp.int32))
    strip_planes = tuple(p for _ in range(S) for p in (*o3, *d3))
    t_pl0, idx_pl0 = jax.jit(lambda: sweep_masked_planes(
        o3, d3, alive, scene.center, scene.radius, 1e-4))()
    attrs10 = jax.jit(lambda ix: fetch_attr_planes(ix, amat, n))(
        idx_pl0.reshape(-1))
    attr_planes0 = [attrs10[j].reshape(rows, LANES) for j in range(10)]

    def mk_record(k):
        def run():
            def body(i, carry):
                state, rad, rec = carry
                state, rad, rec = persist_record_step(
                    state, rad, rec, strip_planes, t_pl0, attr_planes0,
                    i % n_slots, i, 16, S)
                return state, rad, rec
            state, rad, rec = jax.lax.fori_loop(
                0, k, body, (state0, rad0, rec0))
            return jnp.sum(rad[0]) + jnp.sum(rec[0][0])
        return run

    res["record_kernel_ms"] = slope_time(mk_record, k=16) * 1e3
    print(f"record kernel/iter: {res['record_kernel_ms']:.3f} ms")

    # -- 4. replay dattr contraction per slot --------------------------------
    dattr9 = [jax.random.normal(jax.random.fold_in(key, j),
                                (rows * LANES,), jnp.float32)
              for j in range(9)]

    def mk_contract(k):
        def run():
            def body(i, carry):
                ix, acc = carry
                g = _dattr_contract(dattr9, ix, n)
                ix = (ix + jnp.int32(1) + (g[0, 0].astype(jnp.int32) & 0)) % n
                return ix, acc + jnp.sum(g)
            _, acc = jax.lax.fori_loop(0, k, body, (idx0, jnp.float32(0)))
            return acc
        return run

    res["dattr_contract_ms"] = slope_time(mk_contract) * 1e3
    print(f"replay dattr contract/slot: {res['dattr_contract_ms']:.3f} ms")

    # -- 5. whole record forward + whole step (host-fetch timed) ------------
    fwd = jax.jit(lambda s: jnp.sum(_persist_record_forward(
        s, o, d, key, 16, 1e-4, S, n_iters, False, False, tc)[0][0]))
    f_min, f_mean = fetch_time(fwd, scene)
    res["record_forward_ms"] = f_min * 1e3
    print(f"record forward total: min {f_min * 1e3:.1f} ms "
          f"(mean {f_mean * 1e3:.1f})")

    def loss(s):
        rad = trace_recorded_persist(s, o, d, key, 16, 1e-4, S, n_iters,
                                     False, False, tc)
        return jnp.mean(rad * rad)

    vg = jax.jit(lambda s: jax.value_and_grad(loss, allow_int=True)(s)[0])
    s_min, s_mean = fetch_time(vg, scene)
    res["step_ms"] = s_min * 1e3
    res["step_mpaths_per_s"] = R / s_min / 1e6
    print(f"value_and_grad total: min {s_min * 1e3:.1f} ms "
          f"({res['step_mpaths_per_s']:.2f} Mpaths/s)")

    # Derived accounting at the (44, /16) boundary: 44 head iterations.
    head = 44
    res["head_sweep_ms"] = head * res["sweep_ms"]
    res["head_fetch_ms"] = head * res["onehot_fetch_ms"]
    res["head_record_ms"] = head * res["record_kernel_ms"]
    explained = (res["head_sweep_ms"] + res["head_fetch_ms"]
                 + res["head_record_ms"])
    res["record_glue_ms"] = res["record_forward_ms"] - explained
    res["replay_ms"] = res["step_ms"] - res["record_forward_ms"]
    res["replay_contract_est_ms"] = 74 * res["dattr_contract_ms"]
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=2))

    rec = {"ts": time.time(), "label": "grad_decomp_1920x1080x1",
           "device": str(dev)}
    rec.update({k: round(v, 4) for k, v in res.items()})
    append_history(rec, os.path.join(os.path.dirname(__file__), "..",
                                     "bench_history.jsonl"))


if __name__ == "__main__":
    main()
