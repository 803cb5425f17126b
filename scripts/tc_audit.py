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
import numpy as np

import raytracingweekend_jl_tpu as rtw
from raytracingweekend_jl_tpu.utils.metrics import append_history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boundaries", default="32,36,40,44")
    ap.add_argument("--div", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--samples", type=int, default=4,
                    help="per-seed sample offsets to audit; offset 0 is the "
                    "centered ray, offsets >=1 carry the production pixel "
                    "jitter (ADVICE r4: jittered occupancy differs)")
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

    # Audit BOTH the centered sample-0 ray AND production-jittered samples
    # (ADVICE r4: occupancy varies with the pixel jitter too, and grad
    # steps at spp 4/16 trace jittered rays; persist_strict remains the
    # loud runtime backstop for any boundary this sampling misses). The
    # jitter/lens/scatter key derivation mirrors render.pass_body exactly:
    # key_p = fold_in(key, s0), sample id 0 centered.
    scale = jnp.asarray([1.0 / np.float32(W), 1.0 / np.float32(H)],
                        jnp.float32)
    worst = {}
    for b in (int(x) for x in args.boundaries.split(",")):
        tc = (b, args.div)
        for seed in range(args.seeds):
            key = jax.random.PRNGKey(seed)
            for s in range(args.samples):
                key_p = jax.random.fold_in(key, s)
                jit = jax.random.uniform(
                    rngmod.purpose_key(key_p, rngmod.PIXEL_JITTER),
                    (u.shape[0], 2), jnp.float32)
                jit = jnp.where(s == 0, 0.0, jit * scale)
                o, d = get_rays(cam, u + jit[:, 0], v + jit[:, 1],
                                rngmod.purpose_key(key_p, rngmod.LENS))
                tk = rngmod.purpose_key(key_p, rngmod.SCATTER_DIR)
                dropped = int(audit(jnp.asarray(o, jnp.float32),
                                    jnp.asarray(d, jnp.float32), tk, tc))
                rec = {"label": "tc_audit", "boundary": b, "div": args.div,
                       "seed": seed, "sample": s, "dropped": dropped,
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
