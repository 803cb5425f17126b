"""On-device verdict for the megakernel (round-4 verdict Missing #5:
``persistent_render_sum_mega`` was reachable from no driver and appeared in
no bench_history row — unproven code next to measured paths).

Measures flagship-geometry throughput of the mega path against the strided
production forward on the real chip and appends one bench_history row per
variant. Methodology: host-fetch-synchronized wall timing of an spp chunk
(the bench.py scheme), minimum of N repeats.

    python scripts/mega_bench.py [--spp 4] [--repeats 3]
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
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.render import pixel_coords
from raytracingweekend_jl_tpu.ops.integrator import (
    persistent_render_sum_strided)
from raytracingweekend_jl_tpu.utils.metrics import append_history


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    W = args.width
    H = W * 9 // 16
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(0)
    fw, fh = float(np.float32(W)), float(np.float32(H))

    def mega(offset):
        from raytracingweekend_jl_tpu.ops.pallas.experimental.mega_kernel \
            import persistent_render_sum_mega
        acc = persistent_render_sum_mega(scene, cam, u, v, key, args.spp,
                                         offset, 16, 1e-4, fw, fh)
        return float(acc.sum())  # host fetch = the only true sync here

    def strided(offset):
        acc = persistent_render_sum_strided(scene, cam, u, v, key, args.spp,
                                            offset, 16, 1e-4, fw, fh, k=64)
        return float(acc.sum())

    paths = W * H * args.spp
    dev = str(jax.devices()[0])
    for name, fn in (("strided", strided), ("mega", mega)):
        t0 = time.time()
        fn(0)  # compile + warm
        warm = time.time() - t0
        times = []
        for i in range(1, args.repeats + 1):
            t0 = time.time()
            fn(i * args.spp)
            times.append(time.time() - t0)
        best = min(times)
        rec = {"ts": time.time(),
               "label": f"mega_verdict_{name}_{W}x{H}x{args.spp}",
               "wall_s": round(best, 4), "warm_s": round(warm, 1),
               "paths": paths,
               "mpaths_per_s": round(paths / best / 1e6, 3),
               "device": dev}
        append_history(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
