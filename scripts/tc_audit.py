"""Tail-compaction boundary drop audit at flagship occupancy.

The persistent-record gradient default gathers survivors into a 1/16-width
phase-2 block at a static boundary iteration. Earlier boundaries are
faster (fewer full-width record iterations AND a shorter replay walk) but
only admissible if ZERO paths overflow the 1/16 width at the boundary —
dropped paths bias radiance and gradients low (the auto default would
NaN-poison via persist_strict; explicit configs keep the documented
overflow contract).

This audit measures the actual dropped count at flagship geometry for a
ladder of boundaries, across several sample keys (occupancy varies with
the jitter stream), and prints one JSON line per (boundary, seed).

Usage: python scripts/tc_audit.py [--boundaries 32,36,40,44] [--seeds 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.utils.metrics import append_history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boundaries", default="32,36,40,44")
    ap.add_argument("--div", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        persist_dropped_paths)
    from raytracingweekend_jl_tpu.render import image_height_for, pixel_coords
    from raytracingweekend_jl_tpu.camera import get_rays
    from raytracingweekend_jl_tpu import rng as rngmod

    W, H = args.width, image_height_for(args.width)
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    u, v = pixel_coords(W, H)
    hist = os.path.join(os.path.dirname(__file__), "..",
                        "bench_history.jsonl")
    interp = jax.default_backend() == "cpu"

    audit = jax.jit(lambda o, d, tk, tc: persist_dropped_paths(
        scene, o, d, tk, 16, 1e-4, 8, None, interp, False, tc),
        static_argnames=("tc",))

    worst = {}
    for b in (int(x) for x in args.boundaries.split(",")):
        tc = (b, args.div)
        for seed in range(args.seeds):
            key = jax.random.PRNGKey(seed)
            o, d = get_rays(cam, u, v, rngmod.purpose_key(key, rngmod.LENS))
            tk = rngmod.purpose_key(key, rngmod.SCATTER_DIR)
            dropped = int(audit(jnp.asarray(o, jnp.float32),
                                jnp.asarray(d, jnp.float32), tk, tc))
            rec = {"label": "tc_audit", "boundary": b, "div": args.div,
                   "seed": seed, "dropped": dropped,
                   "paths": W * H, "device": str(jax.devices()[0])}
            print(json.dumps(rec), flush=True)
            worst[b] = max(worst.get(b, 0), dropped)
    import time
    append_history({"ts": time.time(), "label": "tc_audit_worst",
                    "div": args.div, "width": W,
                    "worst_dropped": {str(k): v for k, v in worst.items()},
                    "device": str(jax.devices()[0])}, hist)
    print(json.dumps({"worst_dropped": worst}), flush=True)


if __name__ == "__main__":
    main()
