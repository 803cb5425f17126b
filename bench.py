"""Round benchmark: flagship-scene path throughput on the real chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline (BASELINE.md): the reference renders random_spheres 1920x1080x1000spp
in 1282.4 s on a 16-thread Ryzen 3700 = 1.617 Mpaths/s. ``vs_baseline`` is our
steady-state Mpaths/s divided by that (higher is better). The flagship
wall-clock estimate for the full 1000 spp render is included as an extra field.
"""

import json
import time

import numpy as np


# Reference flagship: 1920*1080*1000 paths / 1282.4 s (BASELINE.md).
BASELINE_MPATHS_PER_S = 1920 * 1080 * 1000 / 1282.4 / 1e6  # ~1.617
FLAGSHIP_PATHS = 1920 * 1080 * 1000


def main() -> None:
    import jax
    import raytracingweekend_jl_tpu as rtw
    from raytracingweekend_jl_tpu.render import render_tile_sum, pixel_coords

    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    W, H = 1920, 1080
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(0)
    f32_w, f32_h = float(np.float32(W)), float(np.float32(H))

    tile_sum = jax.jit(render_tile_sum,
                       static_argnames=("n_samples", "max_depth", "tmin", "remat",
                                        "f32_w", "f32_h", "compact",
                                        "samples_per_pass", "persistent"))

    spp_chunk = 25
    spp_pass = 1

    def run_chunk(offset):
        # Persistent wavefront (lanes pinned to pixels, in-place sample
        # regeneration) + Pallas sweep kernel — the production forward path.
        acc = tile_sum(scene, cam, u, v, key, n_samples=spp_chunk,
                       sample_offset=offset, max_depth=16, tmin=1e-4,
                       remat=False, f32_w=f32_w, f32_h=f32_h,
                       compact=False, samples_per_pass=spp_pass,
                       persistent=True)
        return float(acc.sum())  # host fetch = true sync on this platform

    t0 = time.time()
    run_chunk(0)  # compile + warm
    warm_s = time.time() - t0

    # Steady state: measure a few chunks.
    n_chunks = 3
    t0 = time.time()
    for c in range(1, n_chunks + 1):
        run_chunk(c * spp_chunk)
    steady_s = (time.time() - t0) / n_chunks

    paths_per_chunk = W * H * spp_chunk
    mpaths = paths_per_chunk / steady_s / 1e6
    flagship_est_s = FLAGSHIP_PATHS / (mpaths * 1e6)

    print(json.dumps({
        "metric": "flagship_throughput_random_spheres_1920x1080",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths / BASELINE_MPATHS_PER_S, 3),
        "baseline_mpaths_per_s": round(BASELINE_MPATHS_PER_S, 3),
        "flagship_wallclock_est_s": round(flagship_est_s, 1),
        "baseline_flagship_wallclock_s": 1282.4,
        "spp_chunk": spp_chunk,
        "samples_per_pass": spp_pass,
        "warm_s": round(warm_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
