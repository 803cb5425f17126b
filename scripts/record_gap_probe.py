"""Close the record-forward accounting gap: slot-buffer size and DUS.

while_cond_probe measured the full production iteration (sweep -> fetch ->
record kernel) at 1.21 ms under fori/while alike => 44-head ~53 ms + tail
~5-8 ms, yet the real record forward measures 94 ms. Remaining differences
from the real `_run_record_phase`:

  a. n_slots: real buffers are [128, 2048, 128] x21 (2.7 GB carried
     through the loop) vs the probe's [8, ...];
  b. per-iteration `counts.at[i].set(sum(active))` and
     `rec_idx.at[i].set(idx)` driver-side updates.

Measure 1.21-style loops with (a), (b), and both. K=96 vs 192 slope.
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

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.utils.metrics import append_history


def fetch_time(fn, n=4):
    float(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        persist_record_step, _zero_rec, _strip_geometry, LANES)
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
        sweep_masked_planes)
    from raytracingweekend_jl_tpu.ops.materials import fetch_attr_planes
    from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import _attr_mat
    from raytracingweekend_jl_tpu.render import image_height_for, pixel_coords
    from raytracingweekend_jl_tpu.camera import get_rays

    W, H = 1920, image_height_for(1920)
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    key = jax.random.PRNGKey(7)
    u, v = pixel_coords(W, H)
    o, d = get_rays(cam, u, v, key)
    S = 8
    rows, _ = _strip_geometry(W * H, S)
    Wl = rows * LANES
    n = scene.n_spheres
    amat = _attr_mat(scene)

    def planes3(x):
        flat = jnp.asarray(x, jnp.float32)[:Wl]
        return tuple(flat[:, j].reshape(rows, LANES) for j in range(3))

    o3, d3 = planes3(o), planes3(d)
    izer = jnp.zeros((rows, LANES), jnp.int32)
    ones = jnp.ones((rows, LANES), jnp.float32)
    act0 = jnp.ones((rows, LANES), jnp.int32)
    strip_planes = tuple(p for _ in range(S) for p in (*o3, *d3))
    rad0 = tuple(jnp.zeros((rows, LANES), jnp.float32) for _ in range(3 * S))

    def fresh_state(tok):
        return (o3[0] + tok, o3[1], o3[2], d3[0], d3[1], d3[2],
                ones, ones, ones, izer, izer, act0)

    def mk(k, n_slots, dus):
        rec0 = _zero_rec(n_slots, rows)
        cnt0 = jnp.zeros((n_slots,), jnp.int32)
        idx0 = jnp.zeros((n_slots, Wl), jnp.int32)

        def run():
            def body(i, carry):
                rad, rec, cnt, ridx, tok = carry
                state = fresh_state(tok)
                if dus:
                    cnt = cnt.at[i % n_slots].set(jnp.sum(state[11]))
                t_pl, idx_pl = sweep_masked_planes(
                    state[0:3], state[3:6], state[11], scene.center,
                    scene.radius, 1e-4)
                attrs10 = fetch_attr_planes(idx_pl.reshape(-1), amat, n)
                attr_planes = [attrs10[j].reshape(rows, LANES)
                               for j in range(10)]
                state, rad, rec = persist_record_step(
                    state, rad, rec, strip_planes, t_pl, attr_planes,
                    i % n_slots, i, 16, S)
                if dus:
                    ridx = ridx.at[i % n_slots].set(idx_pl.reshape(-1))
                return rad, rec, cnt, ridx, tok + 1e-9 * state[6][0, 0]

            rad, rec, cnt, ridx, tok = jax.lax.fori_loop(
                0, k, body, (rad0, rec0, cnt0, idx0, jnp.float32(0)))
            return (jnp.sum(rad[0]) + tok + jnp.sum(cnt)
                    + jnp.sum(ridx[0][:8]))
        return run

    res = {}
    for name, n_slots, dus in (("s8", 8, False),
                               ("s128", 128, False),
                               ("s8_dus", 8, True),
                               ("s128_dus", 128, True)):
        t1 = fetch_time(jax.jit(mk(96, n_slots, dus)))
        t2 = fetch_time(jax.jit(mk(192, n_slots, dus)))
        res[f"{name}_ms_per_iter"] = round(max(t2 - t1, 0.0) / 96 * 1e3, 4)
        print(name, res[f"{name}_ms_per_iter"], "ms/iter", flush=True)

    rec = {"ts": time.time(), "label": "record_gap_probe",
           "device": str(jax.devices()[0])}
    rec.update(res)
    print(json.dumps(rec), flush=True)
    append_history(rec, os.path.join(os.path.dirname(__file__), "..",
                                     "bench_history.jsonl"))


if __name__ == "__main__":
    main()
