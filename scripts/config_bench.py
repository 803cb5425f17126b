"""On-device benchmark of the non-flagship BASELINE.json configs.

BASELINE.json lists five canonical configs; bench.py covers only the
flagship. This driver measures the other four on the real chip with the
production persistent path, appends records to ``bench_history.jsonl``, and
prints a README-ready table (reference analog: the microbench rows of
BASELINE.md / src/proto/proto.jl timing history).

Usage:  python scripts/config_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

#: (label, scene, camera, W, H, spp) — BASELINE.json configs 1-4. The defocus
#: config uses t_cam2 (aperture 2.0 demo camera, src/proto/proto.jl:21-22) on
#: the diffuse+metal dielectric scene.
CONFIGS = [
    ("2_spheres_200x100x8", "2_spheres", "default", 200, 100, 8),
    ("4_spheres_400x200x32", "4_spheres", "default", 400, 200, 32),
    ("diel_hollow_400x200x64", "diel_spheres_hollow", "hollow_glass", 400, 200, 64),
    ("defocus_800x400x128", "diel_spheres", "cam2", 800, 400, 128),
    # The two published microbenches bench.py/the above do not cover
    # (src/proto/proto.jl:142-144 and :196-200).
    ("random_96x54x1", "random_spheres", "cam1", 96, 54, 1),
    ("random_200x112x32", "random_spheres", "cam1", 200, 112, 32),
]

#: Reference microbench anchors (BASELINE.md): measured reference wall-clocks
#: for *similar* configs, scaled by path count to the config benchmarked here
#: (the reference never published these exact four; the scale base is cited
#: per row). None = no defensible anchor.
REF_ANCHORS = {
    # scene_2_spheres 96x54x16 took 951.4 us single-thread-era
    # (src/proto/proto.jl:64-66) => per-path 11.5 ns; 200x100x8 = 160k paths.
    "2_spheres_200x100x8": 951.4e-6 / (96 * 54 * 16) * (200 * 100 * 8),
    # random_spheres 200x112x32 took 296.8 ms on 16T (src/proto/proto.jl:196-200)
    # — harder scene than 4_spheres; used as a conservative anchor.
    "4_spheres_400x200x32": 296.8e-3 / (200 * 112 * 32) * (400 * 200 * 32),
    # scene_diel_spheres 96x54x16 (t_cam2) 6.52 ms on 16T
    # (src/proto/proto.jl:269-271).
    "diel_hollow_400x200x64": 6.52e-3 / (96 * 54 * 16) * (400 * 200 * 64),
    "defocus_800x400x128": 6.52e-3 / (96 * 54 * 16) * (800 * 400 * 128),
    # Direct published numbers, unscaled (same config).
    "random_96x54x1": 2.04e-3,
    "random_200x112x32": 296.8e-3,
}


def main() -> None:
    from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import raytracingweekend_jl_tpu as rtw
    from raytracingweekend_jl_tpu.utils.metrics import append_history

    cam_builders = {"default": rtw.t_default_cam, "cam1": rtw.t_cam1,
                    "cam2": rtw.t_cam2, "hollow_glass": rtw.hollow_glass_cam}

    hist = os.path.join(os.path.dirname(__file__), "..", "bench_history.jsonl")
    rows = []
    for label, scene_name, cam_name, W, H, spp in CONFIGS:
        scene = rtw.ALL_SCENES[scene_name]()
        cam = cam_builders[cam_name]()
        paths = W * H * spp

        # ONE jitted dispatch per run; sync via a 4-byte scalar fetch of the
        # on-device image sum. The full-image readback is an axon-tunnel
        # artifact (~11 MB/s — a 200x100 f32 image alone costs ~20 ms, dwarfing
        # the render); it is timed separately below as img_fetch_s so the
        # record stays honest about what the headline excludes.
        run_jit = jax.jit(lambda seed: rtw.render_radiance(
            scene, cam, W, spp, image_height=H, seed=seed,
            persistent=True).sum())

        def run(seed):
            return float(run_jit(jnp.int32(seed)))  # scalar fetch = sync

        t0 = time.time(); run(0); warm = time.time() - t0
        t0 = time.time()
        img_host = np.asarray(rtw.render_radiance(
            scene, cam, W, spp, image_height=H, seed=0, persistent=True))
        img_fetch_s = time.time() - t0
        del img_host
        # BenchmarkTools-style methodology (the reference reports @benchmark
        # MINIMA, src/proto/proto.jl:197-200): measure N repeats, report the
        # min as the headline and keep the spread so tunnel jitter cannot
        # mask regressions.
        samples = []
        for s in (1, 2, 3, 4, 5):
            t0 = time.time(); run(s); samples.append(time.time() - t0)
        steady = min(samples)

        # DEVICE-execution time: the axon tunnel charges ~15-30 ms RTT per
        # dispatch+fetch, which floors small-config wall clocks regardless
        # of device speed (2_spheres renders in <1 ms of device time under a
        # ~30 ms round trip). Iterate the render N times inside ONE jitted
        # program (seed-varied fori_loop — exactly BenchmarkTools'
        # many-evaluations-per-sample methodology, and the reference's CPU
        # numbers pay no tunnel either) and take the slope vs the single
        # run: RTT cancels. Both numbers are recorded; wall_s stays the
        # headline for end-to-end honesty.
        n_loop = 32 if steady < 0.1 else 8

        @jax.jit
        def run_loop(seed0):
            def body(i, acc):
                return acc + rtw.render_radiance(
                    scene, cam, W, spp, image_height=H, seed=seed0 + i,
                    persistent=True).sum()
            return jax.lax.fori_loop(0, n_loop, body, jnp.float32(0))

        float(run_loop(jnp.int32(100)))  # compile
        loop_samples = []
        for s in (101, 102, 103):
            t0 = time.time()
            float(run_loop(jnp.int32(s)))
            loop_samples.append(time.time() - t0)
        dev_iter = max((min(loop_samples) - steady) / (n_loop - 1), 1e-9)

        mpaths = paths / steady / 1e6
        anchor = REF_ANCHORS.get(label)
        rec = {"ts": time.time(), "label": f"config_{label}",
               "wall_s": round(steady, 4), "paths": paths,
               "mpaths_per_s": round(mpaths, 3),
               "wall_mean_s": round(float(np.mean(samples)), 4),
               "wall_max_s": round(max(samples), 4),
               "n_repeats": len(samples),
               "img_fetch_s": round(img_fetch_s, 4),
               "warm_s": round(warm, 1),
               "device_loop_n": n_loop,
               "device_iter_s": round(dev_iter, 6),
               "device_mpaths_per_s": round(paths / dev_iter / 1e6, 3),
               "ref_anchor_s": round(anchor, 4) if anchor else None,
               "vs_ref_anchor": round(anchor / steady, 1) if anchor else None,
               "vs_ref_anchor_device": round(anchor / dev_iter, 1)
               if anchor else None,
               "device": str(jax.devices()[0])}
        append_history(rec, hist)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| config | wall (s) | Mpaths/s | ref anchor (s) | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['label'][7:]} | {r['wall_s']} | {r['mpaths_per_s']} | "
              f"{r['ref_anchor_s']} | {r['vs_ref_anchor']}x |")


if __name__ == "__main__":
    main()
