"""Launch-bound small-render decomposition (round-4 verdict #7).

README reports random_spheres 96x54x1 at ~43 ms wall vs the reference's
2.0 ms in-process CPU number — the launch-bound regime. This probe
quantifies exactly where the wall time goes on the axon tunnel:

  rtt_null        — min wall of a trivial jitted dispatch + 4-byte fetch
                    (the floor no render can beat on this link)
  small_wall      — min wall of the production small render (inline
                    single-dispatch kernel) + full-image fetch
  small_scalar    — same dispatch but fetching only a 4-byte sum
                    (isolates the image-transfer share)
  device_iter_s   — in-dispatch K-vs-1 lax.scan slope of the same program
                    (pure device time per render, no RTT)

Appends one bench_history row with all four. If small_scalar ~= rtt_null
and device_iter_s is microseconds, the wall number is 100% link-bound and
the documented floor stands; any gap is actionable.
"""

import argparse
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
from raytracingweekend_jl_tpu.render import render_radiance, pixel_coords
from raytracingweekend_jl_tpu.utils.metrics import append_history


def _min_wall(fn, n=12):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--scan-k", type=int, default=16)
    args = ap.parse_args()
    if args.scan_k < 2:
        ap.error("--scan-k must be >= 2 (the device time is a K-vs-1 slope)")
    W = args.width
    H = W * 9 // 16

    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()

    # 1. Null dispatch: the link floor.
    one = jnp.ones((8,), jnp.float32)
    null = jax.jit(lambda x: x + 1.0)
    rtt_null = _min_wall(lambda: float(np.asarray(null(one))[0]))

    # 2/3. Production small render, image fetch vs scalar fetch.
    def render_img():
        return np.asarray(render_radiance(scene, cam, W, args.spp,
                                          image_height=H, seed=0,
                                          persistent=True))

    small_wall = _min_wall(lambda: render_img().sum())

    sum_render = jax.jit(lambda s, c: render_radiance(
        s, c, W, args.spp, image_height=H, seed=0, persistent=True).sum())
    small_scalar = _min_wall(lambda: float(sum_render(scene, cam)))

    # 4. Pure device time: K-vs-1 in-dispatch scan slope over the same
    # program with a data-dependent carry (prevents XLA dedup).
    from raytracingweekend_jl_tpu.render import render_tile_sum
    u, v = pixel_coords(W, H)
    fw, fh = float(np.float32(W)), float(np.float32(H))

    def make_scan(k):
        @jax.jit
        def run(scene, cam, key):
            def body(carry, i):
                acc = render_tile_sum(
                    scene, cam, u + carry * 0.0, v, jax.random.fold_in(key, i),
                    args.spp, 0, 16, 1e-4, False, fw, fh, persistent=True)
                return carry + acc.sum() * 1e-30, 0.0
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return c
        return run

    key = jax.random.PRNGKey(0)
    run1, runk = make_scan(1), make_scan(args.scan_k)
    w1 = _min_wall(lambda: float(run1(scene, cam, key)), n=6)
    wk = _min_wall(lambda: float(runk(scene, cam, key)), n=6)
    device_iter_s = max(wk - w1, 0.0) / (args.scan_k - 1)

    paths = W * H * args.spp
    rec = {"ts": time.time(),
           "label": f"small_probe_random_{W}x{H}x{args.spp}",
           "rtt_null_s": round(rtt_null, 4),
           "wall_s": round(small_wall, 4),
           "scalar_fetch_wall_s": round(small_scalar, 4),
           "device_iter_s": round(device_iter_s, 5),
           "paths": paths,
           "mpaths_per_s": round(paths / small_wall / 1e6, 3),
           "device_mpaths_per_s": (round(paths / device_iter_s / 1e6, 2)
                                   if device_iter_s > 0 else None),
           "device": str(jax.devices()[0])}
    append_history(rec)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
