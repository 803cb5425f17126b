"""Checkpoint / resume for long renders.

The reference renders monolithically in memory — a crash loses everything
(reference: src/render.jl:15-43; SURVEY.md §5 'Checkpoint: None'). Here the
sample dimension is chunked: after every chunk the accumulated *radiance sum*
and the number of completed samples are snapshotted to ``.npz``; resuming
continues the spp loop from the next chunk. Because global sample indices key
the RNG streams (render.py) and passes start at multiples of
``samples_per_pass``, a resumed render is sample-exact: interrupt at any chunk
boundary and — for the same ``spp_chunk``/``rays_per_pass`` — the final image
is identical to an uninterrupted chunked run.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..render import (render_tile_sum, pixel_coords, image_height_for,
                      pick_samples_per_pass)
from ..scene import Scene
from .metrics import PhaseTimer


@dataclass
class RenderState:
    """Accumulated render progress: sum of per-sample radiance + count."""

    radiance_sum: np.ndarray  # [H, W, 3] float64 accumulation on host
    samples_done: int
    image_width: int
    image_height: int
    seed: int

    @property
    def image(self) -> np.ndarray:
        """Current mean-radiance estimate (linear)."""
        return self.radiance_sum / max(self.samples_done, 1)


def save_state(state: RenderState, path: str) -> None:
    tmp = path + ".tmp"
    np.savez(tmp if tmp.endswith(".npz") else tmp,
             radiance_sum=state.radiance_sum,
             samples_done=state.samples_done,
             image_width=state.image_width,
             image_height=state.image_height,
             seed=state.seed)
    # numpy appends .npz to names without it
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_state(path: str) -> RenderState:
    z = np.load(path)
    return RenderState(radiance_sum=z["radiance_sum"],
                       samples_done=int(z["samples_done"]),
                       image_width=int(z["image_width"]),
                       image_height=int(z["image_height"]),
                       seed=int(z["seed"]))


def render_checkpointed(scene: Scene, cam: Camera, image_width: int,
                        n_samples: int, *, image_height: int | None = None,
                        seed: int = 0, spp_chunk: int = 50,
                        checkpoint_path: str | None = None,
                        max_depth: int = 16, tmin: float = 1e-4,
                        compact: bool = False, persistent: bool = True,
                        rays_per_pass: int = 1 << 21,
                        progress: bool = False, max_retries: int = 2,
                        timer: PhaseTimer | None = None) -> RenderState:
    """Render ``n_samples`` in chunks of ``spp_chunk``, checkpointing after each.

    If ``checkpoint_path`` exists, resumes from it. Sample-exact: chunk c
    renders global samples [c*spp_chunk, ...) with RNG keyed on the global
    sample index, so the union over chunks equals one long uninterrupted render.

    Failure handling (SURVEY.md §5: the reference has none — a crash kills the
    render): each chunk is retried up to ``max_retries`` times on transient
    device/runtime errors; committed chunks are already durable on disk, so
    the blast radius of any failure is one chunk.

    ``timer`` (per-phase observability, SURVEY.md §5): when given, trace
    dispatch, the device->host radiance fetch, and checkpoint writes are
    accumulated per phase, and each progress line carries the running totals.
    """
    H = image_height if image_height is not None else image_height_for(image_width)
    W = image_width

    if checkpoint_path and os.path.exists(checkpoint_path):
        state = load_state(checkpoint_path)
        if (state.image_width, state.image_height, state.seed) != (W, H, seed):
            raise ValueError("checkpoint does not match render configuration")
    else:
        state = RenderState(np.zeros((H, W, 3)), 0, W, H, seed)

    u, v = pixel_coords(W, H, dtype=cam.origin.dtype)
    key = jax.random.PRNGKey(seed)
    f32_w, f32_h = float(np.float32(W)), float(np.float32(H))

    tile_sum = jax.jit(render_tile_sum,
                       static_argnames=("n_samples", "max_depth", "tmin", "remat",
                                        "f32_w", "f32_h", "compact",
                                        "samples_per_pass", "persistent"))

    if timer is None:
        timer = PhaseTimer()
    # NOTE dispatch/fetch are deliberately SERIAL: on the axon tunnel a
    # dispatch issued while the device is busy blocks instead of queueing, so
    # a lookahead pipeline measured ~1.5x SLOWER (10.7 vs 6.9 s per 100-spp
    # flagship chunk). The radiance comes back as f32 (halves the ~50 MB/chunk
    # tunnel transfer) and is accumulated in f64 on the host; fetch cost per
    # path shrinks linearly with spp_chunk — prefer chunks >= 50 spp on
    # full-HD renders.
    while state.samples_done < n_samples:
        todo = min(spp_chunk, n_samples - state.samples_done)
        spp_pass = pick_samples_per_pass(W * H, todo, rays_per_pass)
        t0 = time.time()
        for attempt in range(max_retries + 1):
            try:
                timer.start("trace")
                acc = tile_sum(scene, cam, u, v, key, n_samples=todo,
                               sample_offset=state.samples_done,
                               max_depth=max_depth, tmin=tmin, remat=False,
                               f32_w=f32_w, f32_h=f32_h, compact=compact,
                               samples_per_pass=spp_pass, persistent=persistent)
                timer.stop("trace")
                timer.start("fetch")  # host fetch = the true device sync
                acc = np.asarray(acc).astype(np.float64).reshape(H, W, 3)
                timer.stop("fetch")
                break
            except Exception as e:  # noqa: BLE001 — device faults are opaque
                for ph in ("trace", "fetch"):
                    timer.discard(ph)  # drop the failed attempt's timer
                if attempt >= max_retries:
                    raise
                if progress:
                    print(json.dumps({"retry": attempt + 1,
                                      "chunk_offset": state.samples_done,
                                      "error": repr(e)[:200]}), flush=True)
        dt = time.time() - t0
        state.radiance_sum = state.radiance_sum + acc
        state.samples_done += todo
        if checkpoint_path:
            timer.start("checkpoint")
            save_state(state, checkpoint_path)
            timer.stop("checkpoint")
        if progress:
            paths = W * H * todo
            print(json.dumps({"samples_done": state.samples_done,
                              "chunk_s": round(dt, 3),
                              "paths_per_s": round(paths / dt, 1),
                              "phases": timer.as_dict()}), flush=True)
    return state
