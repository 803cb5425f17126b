"""Does the record loop's data-dependent while-cond stall the pipeline?

The record forward runs `lax.while_loop(cond=any(active), body=...)`. Each
iteration's cond is a full [2048,128] reduction whose scalar result gates
the next iteration — a potential per-iteration pipeline bubble that none
of the fori_loop-based component probes pay (they measured
sweep+fetch+record = 1.27 ms/iter while the real loop averages ~1.9).

Measure the SAME body (sweep + fetch + record step) under:
  a. fori_loop, no cond            (the component probes' framing)
  b. while_loop with any() cond    (the production framing)
  c. while_loop, cond checks every 4th iteration (bundled fori inside)

K=128 vs 256 slope, host-fetch timed. Appends ``while_cond_probe`` row.
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
    n_slots = 8
    rec0 = _zero_rec(n_slots, rows)
    rad0 = tuple(jnp.zeros((rows, LANES), jnp.float32) for _ in range(3 * S))
    izer = jnp.zeros((rows, LANES), jnp.int32)
    ones = jnp.ones((rows, LANES), jnp.float32)
    act0 = jnp.ones((rows, LANES), jnp.int32)
    strip_planes = tuple(p for _ in range(S) for p in (*o3, *d3))

    def full_body(i, state, rad, rec):
        """The production iteration: sweep -> one-hot fetch -> record."""
        t_pl, idx_pl = sweep_masked_planes(
            state[0:3], state[3:6], state[11], scene.center,
            scene.radius, 1e-4)
        attrs10 = fetch_attr_planes(idx_pl.reshape(-1), amat, n)
        attr_planes = [attrs10[j].reshape(rows, LANES) for j in range(10)]
        return persist_record_step(
            state, rad, rec, strip_planes, t_pl, attr_planes,
            i % n_slots, i, 16, S)

    def fresh_state(tok):
        # Fully-live state each iteration (occupancy never decays) with a
        # carry dependence so iterations can't collapse.
        return (o3[0] + tok, o3[1], o3[2], d3[0], d3[1], d3[2],
                ones, ones, ones, izer, izer, act0)

    def mk_fori(k):
        def run():
            def body(i, carry):
                rad, rec, tok = carry
                state, rad, rec = full_body(i, fresh_state(tok), rad, rec)
                return rad, rec, tok + 1e-9 * state[6][0, 0]
            rad, rec, tok = jax.lax.fori_loop(0, k, body, (rad0, rec0,
                                                           jnp.float32(0)))
            return jnp.sum(rad[0]) + tok
        return run

    def mk_while(k, bundle):
        def run():
            def cond(c):
                i, rad, rec, tok, act = c
                return (i < k) & (act != 0)

            def body(c):
                i, rad, rec, tok, act = c
                if bundle == 1:
                    state, rad, rec = full_body(i, fresh_state(tok), rad,
                                                rec)
                    i = i + 1
                else:
                    def inner(j, cc):
                        rad, rec, tok = cc
                        state, rad, rec = full_body(j, fresh_state(tok),
                                                    rad, rec)
                        return rad, rec, tok + 1e-9 * state[6][0, 0]
                    rad, rec, tok = jax.lax.fori_loop(
                        i, i + bundle, inner, (rad, rec, tok))
                    i = i + bundle
                    state = fresh_state(tok)
                act = jnp.any(state[11] != 0).astype(jnp.int32)
                return (i, rad, rec, tok + 1e-9 * state[6][0, 0], act)

            c = (jnp.int32(0), rad0, rec0, jnp.float32(0), jnp.int32(1))
            _, rad, rec, tok, _ = jax.lax.while_loop(cond, body, c)
            return jnp.sum(rad[0]) + tok
        return run

    res = {}
    for name, mk in (("fori", mk_fori),
                     ("while1", lambda k: mk_while(k, 1)),
                     ("while4", lambda k: mk_while(k, 4))):
        t1 = fetch_time(jax.jit(mk(128)))
        t2 = fetch_time(jax.jit(mk(256)))
        res[f"{name}_ms_per_iter"] = round(max(t2 - t1, 0.0) / 128 * 1e3, 4)
        print(name, res[f"{name}_ms_per_iter"], "ms/iter", flush=True)

    rec = {"ts": time.time(), "label": "while_cond_probe",
           "device": str(jax.devices()[0])}
    rec.update(res)
    print(json.dumps(rec), flush=True)
    append_history(rec, os.path.join(os.path.dirname(__file__), "..",
                                     "bench_history.jsonl"))


if __name__ == "__main__":
    main()
