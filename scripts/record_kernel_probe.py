"""Record-kernel per-iteration cost, K=128 slope (noise-proof).

grad_probe2's K=16 slope for persist_record_step vanished under the
tunnel's fetch noise (sub-ms x 16 < ~5 ms noise floor). K=128 vs 256
puts the difference at ~50-100 ms — unambiguous. The input state is
rebuilt fully-live each iteration with a carry-dependent perturbation so
the kernel's occupancy skip never fires and XLA cannot collapse
iterations. Appends a ``record_kernel_slope`` row to bench_history.
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


def fetch_time(fn, n=5):
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
    alive = jnp.ones((rows, LANES), jnp.int32)
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

    def mk(k):
        def run():
            def body(i, carry):
                rad, rec, tok = carry
                state = (o3[0] + tok, o3[1], o3[2], d3[0], d3[1], d3[2],
                         ones, ones, ones, izer, izer, act0)
                state, rad, rec = persist_record_step(
                    state, rad, rec, strip_planes, t_pl0, attr_planes0,
                    i % n_slots, i, 16, S)
                return rad, rec, tok + 1e-9 * state[6][0, 0]
            rad, rec, tok = jax.lax.fori_loop(
                0, k, body, (rad0, rec0, jnp.float32(0)))
            return jnp.sum(rad[0]) + jnp.sum(rec[0][0]) + tok
        return run

    t1 = fetch_time(jax.jit(mk(128)))
    t2 = fetch_time(jax.jit(mk(256)))
    per_iter = max(t2 - t1, 0.0) / 128
    rec = {"ts": time.time(), "label": "record_kernel_slope",
           "k": "128v256", "t128_s": round(t1, 4), "t256_s": round(t2, 4),
           "ms_per_iter": round(per_iter * 1e3, 4),
           "device": str(jax.devices()[0])}
    print(json.dumps(rec), flush=True)
    append_history(rec, os.path.join(os.path.dirname(__file__), "..",
                                     "bench_history.jsonl"))


if __name__ == "__main__":
    main()
