"""Spatial-structure prototype measurement (docs/SPATIAL.md decision record).

Measures the two-level cluster sweep (ops/pallas/experimental/grid_kernel.py) against the
production flat sweep on the flagship scene, across LANE ORDERINGS — the
variable SWEEP_HEADROOM.md identified as decisive (block-level culling only
pays when a block's rays are spatially coherent):

- row-major: chunked full-width rows (the fused-gradient record layout)
- strided: the production persistent layout (k=64 pixel strides)
- tile32 / tile91: pixels permuted so each 8192-ray block covers a compact
  image tile (narrow frustum -> clusters become cullable)
- bounce1: directions after one lambertian bounce (decoherence check)

Usage: python scripts/spatial_probe.py [--width 1920] [--height 1080]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def tile_perm(W, H, tw, th):
    i, j = np.mgrid[0:H, 0:W]
    key = ((i // th) * ((W + tw - 1) // tw) + (j // tw)) * (W * H) \
        + (i % th) * tw + (j % tw)
    return np.argsort(key.ravel(), kind="stable")


def strided_perm(n, k):
    """Production strided layout: lane l serves pixels l, l+n/k, ... —
    equivalently pixel p maps to position (p % (n//k)) * k + p // (n//k)."""
    stride = n // k
    idx = np.arange(n)
    return np.argsort((idx % stride) * k + idx // stride, kind="stable")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import raytracingweekend_jl_tpu as rtw
    from raytracingweekend_jl_tpu import rng as rngmod
    from raytracingweekend_jl_tpu.scene import trim_scene
    from raytracingweekend_jl_tpu.camera import get_rays
    from raytracingweekend_jl_tpu.render import pixel_coords
    from raytracingweekend_jl_tpu.ops.pallas.experimental.grid_kernel import (
        build_grid, grid_sweep)
    from raytracingweekend_jl_tpu.ops.pallas.intersect_kernel import (
        _sweep, BLOCK_ROWS)
    from raytracingweekend_jl_tpu.ops.intersect import BIG
    from raytracingweekend_jl_tpu.ops.sampling import unit_sphere_directions

    interp = jax.default_backend() == "cpu"
    W, H = args.width, args.height
    R = W * H
    scene = trim_scene(rtw.ALL_SCENES["random_spheres"]())
    g = build_grid(scene)
    planes = tuple(jnp.asarray(g[k]) for k in
                   ("bx", "by", "bz", "bk", "cx", "cy", "cz", "ck", "im"))
    n_pairs_flat = R * scene.n_spheres
    cam = rtw.t_cam1()
    u, v = pixel_coords(W, H)
    key = jax.random.PRNGKey(3)
    o, d = get_rays(cam, u, v, rngmod.purpose_key(key, rngmod.LENS))

    # Bounce-1 rays: advance to the hit point, scatter lambertian.
    t0_, idx0 = _sweep(o, d, (scene.center, scene.radius), 1e-4, interp)
    hitp = o + jnp.where(t0_ < BIG, t0_, 1.0)[:, None] * d
    n_vec = (hitp - scene.center[idx0])
    n_vec = n_vec / jnp.maximum(jnp.linalg.norm(n_vec, axis=-1,
                                                keepdims=True), 1e-9)
    rnd = unit_sphere_directions(
        rngmod.purpose_key(key, rngmod.SCATTER_DIR), (R,))
    d1 = n_vec + rnd
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-9)

    jit_flat = jax.jit(lambda oo, dd: _sweep(
        oo, dd, (scene.center, scene.radius), 1e-4, interp)[0].sum())
    jit_grid = jax.jit(lambda oo, dd: grid_sweep(
        oo, dd, planes, g["n_global"], g["K"], g["P"], 1e-4, interp))

    def timed(f, *a):
        f(*a)

        def once():
            t0 = time.time()
            r = f(*a)
            jax.tree.map(lambda x: float(jnp.sum(x)), r)  # host fetch
            return time.time() - t0
        return min(once() for _ in range(3))

    hist = os.path.join(os.path.dirname(__file__), "..",
                        "bench_history.jsonl")
    from raytracingweekend_jl_tpu.utils.metrics import append_history

    orderings = {
        "row_major": None,
        "strided_k64": strided_perm(R, 64),
        "tile32": tile_perm(W, H, 32, 32),
        "tile128x64": tile_perm(W, H, 128, 64),
    }
    ray_sets = {"camera": (o, d), "bounce1": (hitp, d1)}

    base = {}
    for rs_name, (oo, dd) in ray_sets.items():
        s = timed(jit_flat, oo, dd)
        base[rs_name] = s
        print(f"flat    {rs_name:8s}: {s*1e3:8.2f} ms "
              f"({n_pairs_flat/s/1e9:6.1f} G pairs/s)", flush=True)

    for rs_name, (oo, dd) in ray_sets.items():
        for ord_name, perm in orderings.items():
            if perm is not None:
                p = jnp.asarray(perm)
                oo_, dd_ = oo[p], dd[p]
            else:
                oo_, dd_ = oo, dd
            s = timed(jit_grid, oo_, dd_)
            _, _, skips = jit_grid(oo_, dd_)
            skip_frac = float(np.asarray(skips).mean()) / g["K"]
            speedup = base[rs_name] / s
            print(f"grid    {rs_name:8s} {ord_name:12s}: {s*1e3:8.2f} ms  "
                  f"cull {skip_frac*100:5.1f}%  vs flat {speedup:5.2f}x",
                  flush=True)
            append_history({
                "ts": time.time(),
                "label": f"spatial_grid_{rs_name}_{ord_name}_{W}x{H}",
                "wall_s": round(s, 5), "flat_wall_s": round(base[rs_name], 5),
                "vs_flat": round(speedup, 3),
                "cluster_cull_frac": round(skip_frac, 4),
                "block_rows": BLOCK_ROWS, "K": g["K"], "P": g["P"],
                "device": str(jax.devices()[0])}, hist)


if __name__ == "__main__":
    main()
