"""Compiled-HLO analysis of the persistent record forward.

The slope-timed decomposition (docs/GRAD_HEADROOM.md) leaves ~15 ms of the
94 ms record forward unattributed (per-iteration XLA glue). This dumps the
TPU-compiled HLO of the record forward and summarizes the while-body:
fusions, copies, dynamic-update-slices, and their operand shapes — the
evidence for (or against) per-iteration buffer copies.

Writes the full text to /tmp/record_fwd_hlo.txt and prints a summary.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

import raytracingweekend_jl_tpu as rtw


def main():
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _persist_record_forward, default_n_iters)
    from raytracingweekend_jl_tpu.render import image_height_for, pixel_coords
    from raytracingweekend_jl_tpu.camera import get_rays

    W, H = 1920, image_height_for(1920)
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    key = jax.random.PRNGKey(7)
    u, v = pixel_coords(W, H)
    o, d = get_rays(cam, u, v, key)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    n_iters = default_n_iters(8, 16)

    f = jax.jit(lambda s: _persist_record_forward(
        s, o, d, key, 16, 1e-4, 8, n_iters, False, False, (44, 16))[0][0])
    txt = f.lower(scene).compile().as_text()
    path = "/tmp/record_fwd_hlo.txt"
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"HLO: {len(txt)} bytes -> {path}")

    # Summarize ops by kind with total byte estimates for copies/DUS.
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
                   "s8": 1, "u8": 1, "f16": 2}
    kind_count = collections.Counter()
    kind_bytes = collections.Counter()
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")

    def nbytes(shape_str):
        m = shape_re.match(shape_str)
        if not m:
            return 0
        dt, dims = m.group(1), m.group(2)
        n = 1
        for x in dims.split(","):
            if x:
                n *= int(x)
        return n * dtype_bytes.get(dt, 4)

    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.-]+ = (\w+\[[\d,]*\][^ ]*) (\w+)\(", ls)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        if op in ("copy", "dynamic-update-slice", "dynamic-slice",
                  "gather", "scatter", "sort", "transpose", "bitcast",
                  "all-reduce", "custom-call", "fusion"):
            kind_count[op] += 1
            kind_bytes[op] += nbytes(shape)

    print(f"{'op':22s} {'count':>6s} {'output MB':>10s}")
    for op, c in kind_count.most_common():
        print(f"{op:22s} {c:6d} {kind_bytes[op] / 2**20:10.1f}")

    # while-body line ranges for manual inspection
    for i, line in enumerate(txt.splitlines()):
        if "while(" in line or re.search(r"^\s*%?while", line):
            print("while @ line", i, ":", line.strip()[:120])


if __name__ == "__main__":
    main()
