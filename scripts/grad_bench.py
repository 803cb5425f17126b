"""On-device benchmark of the DIFFERENTIABLE path at flagship scale.

North star: "forward+backward intersection/scatter kernels at speed-of-light
per chip". Round-1 shipped the capability but never measured it beyond
32x18x2spp (VERDICT r1 Weak #1). This driver times ``jax.value_and_grad`` of
an image loss through the full wavefront integrator on the flagship scene
(reference analog: the role of src/proto/proto.jl:196-234 for the backward
pass, which the reference does not have at all) and appends JSON records to
``bench_history.jsonl``.

Configurations compared:
- remat on/off (jax.checkpoint of the bounce body: recompute vs stash);
- pixel-chunked vs whole-image wavefronts (residual memory vs dispatch
  overhead).

Throughput metric: paths/s where paths = W*H*spp per gradient step (the same
unit as the forward bench, so fwd/bwd ratios are read off directly).

Usage:  python scripts/grad_bench.py [--width 1920] [--spp 1] [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--quick", action="store_true",
                    help="only the best-known config, one repeat")
    ap.add_argument("--config", default=None,
                    help="run only this config name (fresh-process isolation:"
                         " a device left RESOURCE_EXHAUSTED by one config "
                         "poisons every later one in the same process)")
    ap.add_argument("--canary", action="store_true",
                    help="run the once-per-session twin-AD corruption canary "
                         "(recorded vs remat on a small config) and exit")
    args = ap.parse_args()

    from raytracingweekend_jl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import raytracingweekend_jl_tpu as rtw
    from raytracingweekend_jl_tpu.grad import render_grads
    from raytracingweekend_jl_tpu.render import image_height_for, render_radiance
    from raytracingweekend_jl_tpu.utils.metrics import append_history

    W = args.width
    H = image_height_for(W)
    spp = args.spp
    scene = rtw.scene_random_spheres(seed=1)
    cam = rtw.t_cam1()

    if args.canary:
        # Once-per-session corruption canary (VERDICT r3 weak #3): the
        # recorded kernel pair and the remat XLA transpose must agree on a
        # small config up to MC noise. Raises (exit 3) on corruption.
        from raytracingweekend_jl_tpu.grad import (GradSanityError,
                                                   twin_ad_canary)
        try:
            twin_ad_canary(scene, cam, width=256, n_samples=8)
        except GradSanityError as e:
            print(json.dumps({"canary": "FAIL", "error": str(e)[:300]}),
                  flush=True)
            sys.exit(3)
        print(json.dumps({"canary": "PASS", "width": 256, "spp": 8,
                          "device": str(jax.devices()[0])}), flush=True)
        return

    # Fixed target: the forward render the loss compares against (kept on
    # device; not part of the timed region).
    target = render_radiance(scene, cam, W, 1, seed=123, persistent=True)
    target = jax.block_until_ready(target)
    # Perturbed scene so gradients are non-trivial.
    bad = scene._replace(albedo=jnp.clip(scene.albedo * 0.8, 0, 1))

    configs = [
        ("remat_chunk512k", dict(remat=True, recorded=False, pixel_chunk=1 << 19)),
        ("remat_tileskip_chunk512k",
         dict(remat=True, recorded=False, pixel_chunk=1 << 19, tile_skip=16384)),
        ("noremat_chunk256k", dict(remat=False, recorded=False, pixel_chunk=1 << 18)),
        ("noremat_tileskip_chunk256k",
         dict(remat=False, recorded=False, pixel_chunk=1 << 18, tile_skip=16384)),
        ("dots_chunk512k",
         dict(remat=True, recorded=False, pixel_chunk=1 << 19, remat_policy="dots")),
        ("fusedattrs_remat_chunk512k",
         dict(remat=True, recorded=False, pixel_chunk=1 << 19, fused_attrs=True)),
        ("remat_tileskip64k_chunk512k",
         dict(remat=True, recorded=False, pixel_chunk=1 << 19, tile_skip=1 << 16)),
        ("remat_tileskip256k_chunk512k",
         dict(remat=True, recorded=False, pixel_chunk=1 << 19, tile_skip=1 << 18)),
        ("recorded_chunk512k",
         dict(remat=False, recorded=True, pixel_chunk=1 << 19)),
        ("recorded_chunk1m",
         dict(remat=False, recorded=True, pixel_chunk=1 << 20)),
        ("recorded_full",
         dict(remat=False, recorded=True, pixel_chunk=None)),
        ("staged_b4_div4_chunk1m",
         dict(remat=False, recorded=True, pixel_chunk=1 << 20,
              recorded_stage=(4, 4))),
        ("staged_b3_div2_chunk1m",
         dict(remat=False, recorded=True, pixel_chunk=1 << 20,
              recorded_stage=(3, 2))),
        ("staged_b2_div2_chunk1m",
         dict(remat=False, recorded=True, pixel_chunk=1 << 20,
              recorded_stage=(2, 2))),
        # Fused kernel-pair record/replay (ops/pallas/grad_kernel.py):
        # one Pallas kernel per bounce per direction.
        ("fused_chunk1m",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=1 << 20)),
        ("fused_chunk512k",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=1 << 19)),
        ("fused_full",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=None)),
        # Auto chunking: balanced equal chunks (2x ~1.04M for the flagship)
        # — a 1M power-of-two chunk makes a third chunk that is 93% padding.
        ("fused_auto",
         dict(remat=False, recorded=True, recorded_fused=True)),
        # Staged fused: compact the wavefront at bounce boundaries —
        # measured NEGATIVE (2.39 vs 3.65 unstaged): XLA gathers/scatters
        # at 1M scale cost 40-500 ms, dwarfing the ~90 ms of sweep they
        # save (same root cause as the XLA staged negative).
        ("fused_staged_default_chunk1m",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=1 << 20,
              fused_stages=((0, 1), (2, 2), (4, 4), (8, 8)))),
        ("fused_staged_aggr_chunk1m",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=1 << 20,
              fused_stages=((0, 1), (2, 2), (4, 4), (6, 8), (10, 16)))),
        ("fused_staged_default_full",
         dict(remat=False, recorded=True, recorded_fused=True,
              pixel_chunk=None,
              fused_stages=((0, 1), (2, 2), (4, 4), (8, 8)))),
        # Persistent-record kernel pair (ops/pallas/persist_grad_kernel.py):
        # strip-refilled lanes, per-iteration records — ~3x fewer sweep
        # lane-iterations than the fixed-depth record at flagship occupancy.
        ("persist_s8_auto",
         dict(remat=False, recorded=True, recorded_persist=(8, None))),
        ("persist_s4_auto",
         dict(remat=False, recorded=True, recorded_persist=(4, None))),
        ("persist_s16_auto",
         dict(remat=False, recorded=True, recorded_persist=(16, None))),
        # Tail compaction: survivors gathered into a 1/4-width phase-2
        # wavefront at the static boundary (one small-output gather).
        ("persist_s8_tc32_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (32, 4)))),
        ("persist_s8_tc40_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (40, 8)))),
        ("persist_s8_tc24_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (24, 2)))),
        ("persist_s8_tc44d4_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (44, 4)))),
        ("persist_s8_tc48d8_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (48, 8)))),
        ("persist_s8_tc44_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(8, None, (44, 16)))),
        # Earlier /16 boundaries were DISQUALIFIED by the round-4 drop audit
        # (scripts/tc_audit.py, tc_audit_worst row): boundary 40 drops 4787
        # paths and 36 drops ~32k at flagship occupancy — (44, 16) is the
        # earliest exact /16 boundary. No configs to bench; exactness is
        # the contract.
        ("persist_s12_tc64_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(12, None, (64, 16)))),
        ("persist_s16_tc88_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(16, None, (88, 16)))),
        ("persist_s16_tc72_auto",
         dict(remat=False, recorded=True,
              recorded_persist=(16, None, (72, 16)))),
        # Single unchunked flagship record: the persistent record is ~3x
        # smaller than the fixed-depth one, so the whole image fits HBM.
        ("persist_tc_full",
         dict(remat=False, recorded=True, pixel_chunk=None,
              recorded_persist=(8, None, (44, 16)))),
        # Lean 11-slice record (replay refetches winner attrs from the
        # recorded indices): the spp 8/16 memory mode — measure its 1spp
        # cost vs the 21-slice default.
        ("persist_lean_auto",
         dict(remat=False, recorded=True, pixel_chunk=None,
              recorded_persist=(8, None, (44, 16), False))),
        # Fused whole-phase replay: ONE pallas_call walks each record
        # phase in reverse (carries resident in VMEM, record slices
        # streamed) + a per-slot dattr contraction scan, replacing ~74
        # per-iteration replay launches.
        ("persist_rfused_auto",
         dict(remat=False, recorded=True, pixel_chunk=None,
              recorded_persist=(8, None, (44, 16)),
              _env={"RTW_REPLAY_FUSED": "1"})),
        # Same lever on the fixed-depth pair (the sharded-tile / small-image
        # path): whole reverse bounce walk as one pallas_call.
        ("fused_rfused_auto",
         dict(remat=False, recorded=True, recorded_fused=True,
              _env={"RTW_REPLAY_FUSED": "1"})),
        # S=16 retry under fused replay: the earlier S=16 rejection (12.1-
        # 13.1 vs 13.9) bundled doubled per-iteration REPLAY overhead with
        # the denser-head record gain (12.9 vs 10.6 uncompacted); fused
        # replay removes exactly that overhead, so the trade may flip.
        ("persist_s16_rfused_auto",
         dict(remat=False, recorded=True, pixel_chunk=None,
              recorded_persist=(16, None, (88, 16)),
              _env={"RTW_REPLAY_FUSED": "1"})),
        # The no-flags default path render_loss resolves on its own
        # (TPU full image -> persistent-record pair).
        ("default_auto", dict(remat=None)),
    ]
    if args.quick:
        configs = configs[:1]
    if args.config:
        configs = [c for c in configs if c[0] == args.config]
        if not configs:
            raise SystemExit(f"unknown config {args.config}")

    paths = W * H * spp
    hist_path = os.path.join(os.path.dirname(__file__), "..",
                             "bench_history.jsonl")
    from raytracingweekend_jl_tpu.grad import (render_loss, _params_of,
                                               _with_params)

    # Ambient env A/B knobs must not masquerade as the default config's
    # label — a control run would displace the real default as the "latest
    # row per label" (bench.py's grad headline picks exactly that).
    # ... but an env var explicitly set to its compiled-in default IS the
    # default config — suffixing it would stop that session from
    # refreshing the headline row (ADVICE r4).
    _knob_defaults = {"RTW_DATTR_GROUP": "8", "RTW_REPLAY_FUSED": "1",
                      "RTW_PERSIST_BLOCK_ROWS": None,
                      "RTW_MASKED_BLOCK_ROWS": None}
    _knobs = "".join(f"_{k.lower().replace('rtw_', '')}{os.environ[k]}"
                     for k, dflt in _knob_defaults.items()
                     if k in os.environ and os.environ[k] != dflt)

    for name, kw in configs:
        name = name + _knobs
        remat = kw.pop("remat")
        # Config-scoped env (read at trace time); restored after the config
        # so a full sweep doesn't leak it into later configs' traces.
        env_save = {k: os.environ.get(k) for k in kw.get("_env", {})}
        for k, v in kw.pop("_env", {}).items():
            os.environ[k] = v
        try:
            # One jitted program per step (value_and_grad over ALL chunks +
            # loss glue): on the axon tunnel each separate dispatch costs
            # ~15-30 ms, which at sub-second step times dominates. Seed is a
            # traced argument so repeats reuse the compiled program.
            def f(params, seed, kw=kw, remat=remat):
                extra = {} if remat is None else {"remat": remat}
                return render_loss(_with_params(bad, params), cam, target, W,
                                   spp, seed=seed, **extra, **kw)

            step = jax.jit(jax.value_and_grad(f))
            p0 = _params_of(bad)
            t0 = time.time()
            loss, grads = step(p0, jnp.int32(7))
            g0 = float(np.asarray(grads.albedo).sum())  # host fetch = sync
            warm_s = time.time() - t0

            t0 = time.time()
            loss, grads = step(p0, jnp.int32(8))
            g1 = float(np.asarray(grads.albedo).sum())
            steady_s = time.time() - t0
            # Sanity tripwire: a corrupted row (non-finite / blown
            # magnitude) must FAIL the run, not sit in the JSONL.
            from raytracingweekend_jl_tpu.grad import (GradSanityError,
                                                       check_grads_sane)
            check_grads_sane(grads, loss)

            # DEVICE per-step time via the in-dispatch slope (config_bench's
            # device_iter_s methodology): wall includes the tunnel's fixed
            # ~15-30 ms dispatch+fetch RTT, which real training amortizes
            # (fit_scene_scan) and which an xprof trace confirmed is NOT
            # device time (record fwd: 94 ms wall vs 64.9 ms device). Scan
            # K steps over distinct seeds inside one program; slope
            # (t_2K - t_K)/K is pure device time per step.
            def stepk(params, k):
                def body(c, seed):
                    l, g = jax.value_and_grad(f)(params, seed)
                    s = l + sum(jnp.sum(v) for v in
                                jax.tree.leaves(g)
                                if jnp.issubdtype(v.dtype, jnp.floating))
                    return c + s, None
                out, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    jnp.arange(10, 10 + k, dtype=jnp.int32))
                return out

            device_step_s = None
            try:
                k1, k2 = 2, 4
                f1 = jax.jit(stepk, static_argnums=1)
                float(f1(p0, k1))
                t0 = time.time()
                float(f1(p0, k1))
                ta = time.time() - t0
                float(f1(p0, k2))
                t0 = time.time()
                float(f1(p0, k2))
                tb = time.time() - t0
                device_step_s = max(tb - ta, 1e-9) / (k2 - k1)
            except Exception:  # noqa: BLE001 — OOM at K steps: skip field
                pass

            rec = {"ts": time.time(),
                   "label": f"grad_step_{name}_{W}x{H}x{spp}",
                   "wall_s": round(steady_s, 3), "paths": paths,
                   "mpaths_per_s": round(paths / steady_s / 1e6, 3),
                   "loss": float(loss), "grad_albedo_sum": g1,
                   "warm_s": round(warm_s, 1),
                   "device": str(jax.devices()[0])}
            if device_step_s is not None:
                rec["device_step_s"] = round(device_step_s, 4)
                rec["device_mpaths_per_s"] = round(
                    paths / device_step_s / 1e6, 3)
        except Exception as e:  # noqa: BLE001 — OOM/compile faults per config
            rec = {"ts": time.time(),
                   "label": f"grad_step_{name}_{W}x{H}x{spp}",
                   "error": repr(e)[:300]}
        for k, v in env_save.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        append_history(rec, hist_path)
        print(json.dumps(rec), flush=True)
        if "GradSanityError" in rec.get("error", ""):
            sys.exit(3)  # corrupted gradients: fail the whole run loudly


if __name__ == "__main__":
    main()
