"""Differentiable rendering — gradients of image losses w.r.t. scene parameters.

The reference has no autodiff at all (SURVEY.md §2.9); this module supplies the
north-star capability: ``grad(loss(render))`` w.r.t. sphere centers, radii, and
albedos. Gradients flow through every continuous quantity (hit distance t, hit
point, normal, attenuation products, Schlick reflectance, sky lerp) while the
discrete events (closest-hit argmin, material code, reflect-vs-refract coin,
front-face flip) are treated as detached choices — the straight-through
estimator pattern of RayTracer.jl (PAPERS.md). Visibility/silhouette boundary
terms are not estimated (interior gradients only), which is exactly what
finite-difference tests validate away from silhouettes.

The bounce loop is rematerialised (``remat=True`` → ``jax.checkpoint``) so the
backward sweep recomputes per-bounce state instead of holding all 16 wavefront
frontiers in HBM.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .camera import Camera
from .render import render_radiance
from .scene import Scene

#: Fields of :class:`Scene` that are differentiable parameters.
DIFF_FIELDS = ("center", "radius", "albedo", "fuzz", "ir")

#: Explicit HBM budget (bytes) for the recorded path's per-bounce records.
#: ``None`` (the default) resolves from the actual device at first use
#: (:func:`record_hbm_budget`); RTW_RECORD_HBM_GB pins it, and tests
#: monkeypatch this attribute directly.
RECORD_HBM_BUDGET = (int(float(os.environ["RTW_RECORD_HBM_GB"]) * 2**30)
                     if "RTW_RECORD_HBM_GB" in os.environ else None)

#: Reserve carved out of device HBM for everything that is NOT path
#: records: wavefront state planes, replay cotangent buffers, the scene +
#: one-hot intermediates, and allocator slack. Measured at flagship spp 16:
#: 9.24 GiB of lean records + the live set fit a 16 GiB v5e with this
#: reserve (grad_step_default_auto_1920x1080x16: 11.1 -> 17.0 Mpaths/s
#: once the records stayed resident instead of pass-remat recompute).
_HBM_RESERVE_BYTES = int(4.5 * 2**30)

#: device_kind-prefix -> HBM GiB fallback for platforms whose PJRT returns
#: no memory_stats (the axon tunnel does not). Longest prefix wins.
_HBM_GIB_BY_KIND = (
    ("TPU v5 lite", 16), ("TPU v5e", 16), ("TPU v5p", 95), ("TPU v5", 95),
    ("TPU v6 lite", 32), ("TPU v6e", 32),
    ("TPU v4", 32), ("TPU v3", 16), ("TPU v2", 8),
)

_RESOLVED_HBM_BUDGET: int | None = None


def record_hbm_budget() -> int:
    """Bytes of HBM the recorded gradient paths may spend on path records.

    Explicit ``RECORD_HBM_BUDGET`` (env / monkeypatch) wins; otherwise the
    device's HBM is queried (``memory_stats()['bytes_limit']``, falling
    back to a device_kind table when the PJRT reports none) minus a fixed
    live-set reserve. CPU keeps the historical 8 GiB default — records
    live in host RAM there and the number only steers test chunking."""
    if RECORD_HBM_BUDGET is not None:
        return RECORD_HBM_BUDGET
    global _RESOLVED_HBM_BUDGET
    if _RESOLVED_HBM_BUDGET is None:
        hbm = None
        try:
            dev = jax.local_devices()[0]
            if dev.platform != "cpu":
                stats = dev.memory_stats() or {}
                hbm = stats.get("bytes_limit")
                if not hbm:
                    kind = getattr(dev, "device_kind", "") or ""
                    for prefix, gib in _HBM_GIB_BY_KIND:
                        if kind.startswith(prefix):
                            hbm = gib * 2**30
                            break
        except Exception:  # noqa: BLE001 — any backend quirk -> default
            hbm = None
        _RESOLVED_HBM_BUDGET = (max(hbm - _HBM_RESERVE_BYTES, 1 << 31)
                                if hbm else 8 * 2**30)
    return _RESOLVED_HBM_BUDGET

#: Per-ray-per-bounce record cost: 12 floats (org, dir, thr, t) + index +
#: 2 bools, f32-dominated, doubled for the reverse scan's cotangent buffers.
_RECORD_BYTES_PER_RAY_BOUNCE = 12 * 4 * 2 + 8

#: Fused kernel-pair path (ops/pallas/grad_kernel.py): 21 f32 record planes
#: + 1 int32 winner index per ray per bounce, updated in place (no doubling).
_FUSED_BYTES_PER_RAY_BOUNCE = 21 * 4 + 4


def auto_pixel_chunk(n_pix: int, max_depth: int,
                     budget: int | None = None,
                     bytes_per_ray_bounce: int | None = None,
                     soft_cap: int = 1 << 20) -> int | None:
    """Pixel chunk that keeps the recorded-path residuals inside HBM.

    The recorded integrator (ops/grad_trace.py) stashes ~12 floats per ray per
    bounce; a flagship-resolution ``render_grads`` with default args must not
    OOM just because the caller didn't read a docstring (the round-2 contract
    was implicit). Returns ``None`` when the whole image fits, else the
    largest lane-aligned chunk within the budget. The floor is 8192 rays —
    one (64, 128) Pallas block, the hard lane minimum — so a pathologically
    small budget floors there rather than returning an unrunnable chunk
    (8192 rays of records is ~12 MB, negligible on any real device).
    """
    budget = record_hbm_budget() if budget is None else budget
    if bytes_per_ray_bounce is None:
        bytes_per_ray_bounce = _RECORD_BYTES_PER_RAY_BOUNCE
    r_max = budget // (bytes_per_ray_bounce * max(max_depth, 1))
    # Soft cap besides HBM: ~1M-ray chunks measured fastest for the
    # fixed-depth records (full-image 2M-ray records run 2-3x slower —
    # grad_step_fused_full / grad_step_recorded_full rows — from
    # record-buffer memory pressure); the persistent record is ~3x smaller
    # and measured AT PARITY unchunked (grad_step_persist_tc_full), so its
    # caller raises the cap to run the flagship as one chunk.
    r_max = min(r_max, soft_cap)
    # Floor BEFORE the ceil-divide: a budget below one ray-bounce of record
    # bytes made r_max == 0 and the division below crash instead of
    # flooring at 8192 as the docstring promises (round-4 review).
    r_max = max(r_max, 8192)
    if n_pix <= r_max:
        return None
    # BALANCE the chunks: every chunk is padded to the chunk size and pays
    # full kernel cost, so ceil-dividing the image into the fewest equal
    # chunks beats a power-of-two chunk with a mostly-padding tail (measured:
    # 1920x1080 with a 1M chunk makes 3 chunks, the third 93% dead lanes —
    # 568 ms/step; two balanced chunks cost ~2/3 of that). Lane-aligned to
    # 8192 = one (64,128) Pallas block.
    n_chunks = -(-n_pix // r_max)
    chunk = -(-n_pix // n_chunks)
    return max(8192, -(-chunk // 8192) * 8192)


class SceneGrads(NamedTuple):
    """Gradient pytree matching the differentiable subset of :class:`Scene`."""

    center: jnp.ndarray
    radius: jnp.ndarray
    albedo: jnp.ndarray
    fuzz: jnp.ndarray
    ir: jnp.ndarray


def _with_params(scene: Scene, params: SceneGrads) -> Scene:
    return scene._replace(**params._asdict())


def _params_of(scene: Scene) -> SceneGrads:
    return SceneGrads(**{f: getattr(scene, f) for f in DIFF_FIELDS})


def resolve_grad_path(kwargs: dict, n_pix: int, backend: str) -> dict:
    """Resolve the gradient-integrator selection in place (and return it).

    Explicit flags (remat / recorded / recorded_fused / recorded_persist /
    recorded_stage) are always respected. With none given, the TPU default
    is the persistent-record kernel pair with tail compaction for big
    renders (13.8 Mpaths/s flagship value_and_grad, vs 7.99 fixed-depth
    fused and 2.78 XLA recorded — bench_history grad_step_* rows); the
    fixed-depth pair for small images, where the >=8192-lane strip geometry
    degenerates to one strip plus dummy refills; and the XLA recorded path
    on CPU. The (44, 16) boundary is verified zero-drop on all six scenes
    at flagship occupancies and scales with max_depth; the auto default
    additionally runs STRICT (persist_strict=True): a scene that overflows
    the boundary NaN-poisons loss and gradients on the first step instead
    of training silently biased. Audit with ``persist_dropped_paths``, or
    pin ``recorded_persist=(8, None)`` for the compaction-free exact
    path."""
    # Forward-only fast paths have no VJP: differentiating them would fail
    # deep inside jax with "differentiation rule for pallas_call not
    # implemented" (persistent) or silently bypass the recorded integrator
    # (compact). Fail fast with the actual contract instead.
    for fwd_only in ("persistent", "compact"):
        if kwargs.get(fwd_only):
            raise ValueError(
                f"{fwd_only}=True is a forward-only rendering flag; the "
                "gradient integrators are selected via recorded/"
                "recorded_fused/recorded_persist (or left to the default)")
    rp = kwargs.get("recorded_persist")
    if rp is not None and (isinstance(rp, bool)
                           or not isinstance(rp, (tuple, list))
                           or len(rp) < 2):
        raise ValueError(
            "recorded_persist must be (n_strips, n_iters|None[, "
            "tail_compact]) — e.g. (8, None) or (8, None, (44, 16)); "
            f"got {rp!r}")
    # TRUTHY values choose a path; explicitly spelling out a default
    # (remat=False, recorded_persist=None) must not silently disable the
    # fast auto-selection (round-4 review). recorded=False is the one
    # explicit falsy CHOICE (it means "use the remat transpose").
    path_chosen = (any(kwargs.get(k) for k in
                       ("remat", "recorded", "recorded_fused",
                        "recorded_persist", "recorded_stage"))
                   or kwargs.get("recorded") is False)
    if kwargs.get("recorded_fused") or kwargs.get("recorded_persist"):
        kwargs["recorded"] = True
    kwargs.setdefault("recorded", not kwargs.get("remat", False))
    kwargs.setdefault("remat", not kwargs["recorded"])
    if not path_chosen and backend == "tpu":
        if n_pix >= (1 << 17):
            # Boundary iteration scales with depth (44 was tuned and
            # zero-drop-verified at the default depth 16).
            depth = kwargs.get("max_depth", 16)
            b1 = max(-(-44 * depth // 16), 8)
            kwargs["recorded_persist"] = (8, None, (b1, 16))
            # The AUTO-selected tail-compacted default must not silently
            # bias an unusual scene: any dropped path NaN-poisons the
            # primal and gradients (loud first-step failure) instead of
            # the documented bias-low overflow contract explicit configs
            # keep (ADVICE r3 medium).
            kwargs.setdefault("persist_strict", True)
        else:
            kwargs["recorded_fused"] = True
    return kwargs


def plan_pass_memory(kwargs: dict, n_pix: int, n_samples: int) -> dict:
    """Decide how the recorded pass loop fits HBM (in place; returns kwargs).

    Reverse-mode keeps every sample pass's path records alive; at high spp
    that is n_pass x whole-image records (46 GB at flagship spp=16 with the
    fixed-depth record — a compile-time OOM). Escalation when the total
    record footprint exceeds the budget, cheapest first:

    1. fits as-is -> ``remat_passes=False`` (store all passes' records);
    2. persistent path only: drop the recorded attribute planes
       (``rec_attrs=False`` — replay refetches them from the winner
       indices, bitwise-equal gradients, record half the size);
    3. ``remat_passes=True`` — checkpoint the pass loop; every pass's
       record forward is recomputed in the backward.

    The persistent path is priced with its exact footprint
    (``persist_record_bytes``); the generic per-ray-per-bounce formulas
    overestimate it ~15x and previously forced pass remat at spp (4, 8)
    where the records actually fit.
    """
    if not kwargs.get("recorded") or "remat_passes" in kwargs \
            or n_samples <= 1:
        return kwargs
    chunk = kwargs.get("pixel_chunk") or n_pix
    persist = kwargs.get("recorded_persist")
    budget = record_hbm_budget()
    if persist:
        from .ops.pallas.persist_grad_kernel import persist_record_bytes
        n_chunks = -(-n_pix // chunk)

        def total_bytes(rec_attrs):
            # Chunks within a pass coexist in the reverse pass too.
            return n_samples * n_chunks * persist_record_bytes(
                min(chunk, n_pix), persist[0], persist[1],
                persist[2] if len(persist) > 2 else None,
                kwargs.get("max_depth", 16), rec_attrs)

        total = total_bytes(persist[3] if len(persist) > 3 else True)
        if total > budget and len(persist) <= 3 \
                and total_bytes(False) <= budget:
            kwargs["recorded_persist"] = (
                tuple(persist) + (None,) * (3 - len(persist)) + (False,))
            total = total_bytes(False)
    else:
        bpr = (_FUSED_BYTES_PER_RAY_BOUNCE
               if kwargs.get("recorded_fused")
               else _RECORD_BYTES_PER_RAY_BOUNCE)
        total = n_pix * n_samples * bpr * kwargs.get("max_depth", 16)
    kwargs["remat_passes"] = total > budget
    return kwargs


def render_loss(scene: Scene, cam: Camera, target: jnp.ndarray,
                image_width: int, n_samples: int,
                loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
                **kwargs) -> jnp.ndarray:
    """Scalar image loss of a differentiable render against ``target`` [H,W,3]
    (linear radiance, not gamma-encoded — compare in linear space).

    With no path flags the integrator is auto-selected: on TPU the
    persistent-record kernel pair for full images (10.7 Mpaths/s flagship
    value_and_grad, ops/pallas/persist_grad_kernel.py) or the fixed-depth
    fused pair for small ones; on CPU the XLA recorded path
    (ops/grad_trace.py — primal bitwise-identical to the plain trace). Pass
    ``recorded=False, remat=True`` for the checkpointed XLA transpose, or
    any explicit ``recorded*`` flag to pin a variant (see
    scripts/grad_bench.py for the measured menu). ``pixel_chunk`` is
    auto-picked to keep path records inside HBM."""
    # The image height is defined by `target`; a caller-supplied duplicate
    # must agree (render_radiance would otherwise get two values).
    ih = kwargs.pop("image_height", None)
    if ih is not None and ih != target.shape[0]:
        raise ValueError(f"image_height={ih} conflicts with "
                         f"target height {target.shape[0]}")
    resolve_grad_path(kwargs, target.shape[0] * image_width,
                      jax.default_backend())
    if kwargs["recorded"] and "pixel_chunk" not in kwargs:
        persist = kwargs.get("recorded_persist")
        if persist:
            # Persistent record: 21 planes x n_iters x (R / n_strips) bytes
            # per chunk => per-ray-per-bounce equivalent for the shared
            # budget formula. ~3x smaller than the fixed-depth record.
            from .ops.pallas.persist_grad_kernel import default_n_iters
            S_p, n_it = persist[0], persist[1]
            depth = kwargs.get("max_depth", 16)
            n_it = default_n_iters(S_p, depth) if n_it is None else n_it
            bprb = max((21 * 4 + 4) * n_it // (S_p * depth), 1)
            soft_cap = 1 << 21
        elif kwargs.get("recorded_fused"):
            bprb = _FUSED_BYTES_PER_RAY_BOUNCE
            soft_cap = 1 << 20
        else:
            bprb = None
            soft_cap = 1 << 20
        kwargs["pixel_chunk"] = auto_pixel_chunk(
            target.shape[0] * image_width,
            kwargs.get("max_depth", 16),
            bytes_per_ray_bounce=bprb, soft_cap=soft_cap)
    plan_pass_memory(kwargs, target.shape[0] * image_width, n_samples)
    img = render_radiance(scene, cam, image_width, n_samples,
                          image_height=target.shape[0], **kwargs)
    if loss_fn is None:
        return jnp.mean((img - target) ** 2)
    return loss_fn(img, target)


def render_grads(scene: Scene, cam: Camera, target: jnp.ndarray,
                 image_width: int, n_samples: int, **kwargs
                 ) -> tuple[jnp.ndarray, SceneGrads]:
    """(loss, gradients w.r.t. every differentiable scene field)."""

    def f(params: SceneGrads):
        return render_loss(_with_params(scene, params), cam, target,
                           image_width, n_samples, **kwargs)

    loss, grads = jax.value_and_grad(f)(_params_of(scene))
    return loss, grads


class GradSanityError(RuntimeError):
    """A gradient failed the built-in sanity tripwire (non-finite values or
    an absurd magnitude). Raised so corrupted measurements FAIL the run
    instead of landing in a JSONL (the ts-1787002624 incident: a grid-
    alignment bug produced grad_albedo_sum=195971 on device and nothing
    automatic caught it)."""


def check_grads_sane(grads, loss=None, max_abs: float = 1e3) -> None:
    """Host-side tripwire for gradient records: every leaf must be finite and
    its |sum| and max-|elem| below ``max_abs`` (the book scenes' true
    gradient sums are O(0.05); 1e3 is ~4 orders of margin while catching
    blown values instantly). Call it from benchmark/session drivers after
    fetching gradients — it is NOT jittable (it inspects concrete values).
    Raises :class:`GradSanityError` with the offending field."""
    import numpy as np
    if loss is not None:
        lv = float(np.asarray(loss))
        if not np.isfinite(lv):
            raise GradSanityError(f"loss is not finite: {lv}")
    # Derive leaf names from the tree paths (not grads._fields): a field
    # that is itself a multi-leaf pytree would otherwise mislabel or
    # silently truncate the zip (ADVICE r4).
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path).lstrip(".") or "<root>"
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            raise GradSanityError(f"grad[{name}] contains non-finite values "
                                  f"({np.count_nonzero(~np.isfinite(a))} of "
                                  f"{a.size})")
        s, m = abs(float(a.sum())), float(np.abs(a).max())
        if s > max_abs or m > max_abs:
            raise GradSanityError(
                f"grad[{name}] magnitude implausible: |sum|={s:.4g}, "
                f"max|elem|={m:.4g} (bound {max_abs:g}) — likely kernel "
                "corruption; re-run and audit before recording")


def twin_ad_canary(scene: Scene, cam: Camera, width: int = 256,
                   n_samples: int = 8, **kwargs) -> None:
    """Cheap once-per-session corruption cross-check: gradients from the
    recorded (kernel-pair) integrator and the remat (pure-XLA transpose)
    integrator on a small config. The two paths share no replay code but
    estimate the same gradient; their RNG streams differ on hardware, so
    the check is NOISE-ROBUST — per-field L2 norms within 4x and cosine
    similarity > 0.5 — which still catches corruption instantly (the
    ts-1787002624 incident blew the norm by ~6 orders of magnitude).
    Raises :class:`GradSanityError` on disagreement."""
    import numpy as np
    target = render_radiance(scene, cam, width, 1, seed=123)
    bad = scene._replace(albedo=jnp.clip(scene.albedo * 0.8, 0, 1))
    # Shared render config (depth, tmin, chunking, ...) must apply to BOTH
    # twins — the whole point is two estimators of the SAME gradient
    # (round-4 review: kwargs previously reached only the recorded side).
    # Path-selection keys and the fixed seed stay pinned per twin.
    shared = {k: v for k, v in kwargs.items()
              if k not in ("recorded", "remat", "recorded_fused",
                           "recorded_persist", "recorded_stage", "seed")}
    rec_kw = {k: v for k, v in kwargs.items() if k != "seed"}
    _, g_rec = render_grads(bad, cam, target, width, n_samples, seed=5,
                            **rec_kw)
    _, g_ref = render_grads(bad, cam, target, width, n_samples, seed=5,
                            recorded=False, remat=True, **shared)
    check_grads_sane(g_rec)
    check_grads_sane(g_ref)
    for name in SceneGrads._fields:
        a = np.asarray(getattr(g_rec, name), np.float64).ravel()
        b = np.asarray(getattr(g_ref, name), np.float64).ravel()
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        if nb < 1e-9 and na < 1e-9:
            continue
        ratio = na / max(nb, 1e-12)
        if not (0.25 < ratio < 4.0):
            raise GradSanityError(
                f"twin-AD canary: grad[{name}] recorded-vs-remat norm ratio "
                f"{ratio:.3g} (want 0.25-4) — kernel-pair gradients look "
                "corrupted")
        if name == "albedo":
            # Direction check only where the loss has real signal (the
            # canary perturbs albedo): incidental fields (center/fuzz/ir)
            # are MC-noise-dominated at canary spp, so two independent
            # unbiased estimates of them are legitimately near-orthogonal.
            cos = float(a @ b) / max(na * nb, 1e-24)
            if cos < 0.5:
                raise GradSanityError(
                    f"twin-AD canary: grad[albedo] recorded-vs-remat cosine "
                    f"{cos:.3f} (want >0.5) — kernel-pair gradients look "
                    "corrupted")


def sgd_inverse_render_step(scene: Scene, cam: Camera, target: jnp.ndarray,
                            image_width: int, n_samples: int, lr: float = 0.01,
                            **kwargs) -> tuple[jnp.ndarray, Scene]:
    """One gradient-descent step fitting scene parameters to a target image —
    the single-chip version of the "training step" (see parallel/shard.py for
    the sharded one)."""
    loss, grads = render_grads(scene, cam, target, image_width, n_samples, **kwargs)
    new_params = jax.tree.map(lambda p, g: p - lr * g, _params_of(scene),
                              grads)
    return loss, _with_params(scene, new_params)
