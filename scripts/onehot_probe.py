"""On-device decomposition probe for the persistent-record gradient step.

Times, at flagship geometry (one 2.07M-ray chunk, S=8, tc=(44,16)):
  1. record forward alone (the fwd half of the custom VJP)
  2. full value_and_grad step (record + replay)
  3. the MXU one-hot attribute fetch in isolation at record width
  4. the replay's one-hot dattr contraction in isolation
  5. segment_sum alternative for (4)

Purpose: decide whether a Pallas fused one-hot is worth building (the
GRAD_HEADROOM "onehot ~10%" line item), with fresh measurements rather
than estimates. Appends rows to bench_history.jsonl.
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


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.mean(ts))


def main():
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _persist_record_forward, trace_recorded_persist, default_n_iters)
    from raytracingweekend_jl_tpu.ops.materials import _onehot_rows_exact
    from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import (
        _attr_mat, _split3_bf16)
    from raytracingweekend_jl_tpu.render import image_height_for, pixel_coords
    from raytracingweekend_jl_tpu.camera import get_rays

    dev = jax.devices()[0]
    print("device:", dev)
    W, H, spp = 1920, image_height_for(1920), 1
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()
    key = jax.random.PRNGKey(7)
    R = W * H * spp
    u, v = pixel_coords(W, H)
    o, d = get_rays(cam, u, v, key)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    print("rays:", o.shape)

    tc = (44, 16)
    n_iters = default_n_iters(8, 16)

    # 1. record forward alone
    fwd = jax.jit(lambda s, o_, d_: _persist_record_forward(
        s, o_, d_, key, 16, 1e-4, 8, n_iters, False, False, tc)[0])
    t_min, t_mean = timeit(fwd, scene, o, d)
    print(f"record_forward: min {t_min*1e3:.1f} ms  mean {t_mean*1e3:.1f} ms")
    rec_fwd = t_min

    # 2. full value_and_grad
    def loss(s, o_, d_):
        rad = trace_recorded_persist(s, o_, d_, key, 16, 1e-4, 8, n_iters,
                                     False, False, tc)
        return jnp.mean(rad * rad)

    # allow_int: Scene carries the int32 mat_type plane (its cotangent is
    # float0); the probe only reads the timing.
    vg = jax.jit(jax.value_and_grad(loss, allow_int=True))
    t_min, t_mean = timeit(vg, scene, o, d)
    print(f"value_and_grad: min {t_min*1e3:.1f} ms  mean {t_mean*1e3:.1f} ms"
          f"  ({R/t_min/1e6:.2f} Mpaths/s)")
    full = t_min

    # widths as the kernel pads them
    from raytracingweekend_jl_tpu.ops.pallas.persist_grad_kernel import (
        _strip_geometry)
    rows, Wlanes = _strip_geometry(R, 8)
    print("record width:", Wlanes, "rows:", rows)

    amat = _attr_mat(scene)
    n = scene.n_spheres
    idx = jax.random.randint(key, (Wlanes,), 0, n, jnp.int32)
    from raytracingweekend_jl_tpu.ops.materials import _onehot_cols_exact
    from raytracingweekend_jl_tpu.ops.pallas.grad_kernel import _split3_bf16_rows

    # 3. forward one-hot fetch at record width: row form vs flipped
    fetch = jax.jit(lambda i: _onehot_rows_exact(i, amat, n))
    f_row, _ = timeit(fetch, idx)
    fetch_t = jax.jit(lambda i: _onehot_cols_exact(i, amat, n))
    f_col, _ = timeit(fetch_t, idx)
    print(f"onehot_fetch row {f_row*1e3:.3f} ms  flipped {f_col*1e3:.3f} ms "
          f"(x44: {44*f_row*1e3:.1f} vs {44*f_col*1e3:.1f} ms)")

    # 4. replay contraction at record width: row form vs flipped
    rows9 = jax.random.normal(key, (Wlanes, 9), jnp.float32)
    d9 = rows9.T  # [9, W] — the flipped form's natural input

    def contract_row(i, r9):
        onehot = (i[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
                  ).astype(jnp.bfloat16)
        rows27 = _split3_bf16(r9)
        c = jax.lax.dot_general(onehot, rows27, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return c[:, 0:9] + c[:, 9:18] + c[:, 18:27]

    def contract_flip(i, d9_):
        rows27t = _split3_bf16_rows(d9_)
        onehot = (i[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
                  ).astype(jnp.bfloat16)
        c = jax.lax.dot_general(rows27t, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (c[0:9] + c[9:18] + c[18:27]).T

    c_row, _ = timeit(jax.jit(contract_row), idx, rows9)
    c_flip, _ = timeit(jax.jit(contract_flip), idx, d9)
    print(f"replay_contract row {c_row*1e3:.3f} ms  flipped {c_flip*1e3:.3f} "
          f"ms (x44: {44*c_row*1e3:.1f} vs {44*c_flip*1e3:.1f} ms)")

    # 5. segment_sum alternative
    seg = jax.jit(lambda i, r9: jax.ops.segment_sum(r9, i, num_segments=n))
    s_min, _ = timeit(seg, idx, rows9)
    print(f"segment_sum 1 iter: min {s_min*1e3:.3f} ms")

    hist = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench_history.jsonl")
    append_history({
        "label": "grad_step_decomposition_probe_r3b",
        "record_forward_ms": rec_fwd * 1e3,
        "value_and_grad_ms": full * 1e3,
        "replay_ms": (full - rec_fwd) * 1e3,
        "onehot_fetch_row_ms": f_row * 1e3,
        "onehot_fetch_flip_ms": f_col * 1e3,
        "replay_contract_row_ms": c_row * 1e3,
        "replay_contract_flip_ms": c_flip * 1e3,
        "segment_sum_iter_ms": s_min * 1e3,
        "width": int(Wlanes),
        "device": str(dev),
    }, hist)


if __name__ == "__main__":
    main()
