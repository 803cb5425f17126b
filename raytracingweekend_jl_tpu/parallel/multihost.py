"""Multi-host rendering: jax.distributed init + host-local tile IO.

The reference never crosses a process boundary (SURVEY.md §2.4). The
multi-host design here: every host runs the same program; the global
``(tiles, samples)`` mesh spans all hosts with the ``tiles`` axis laid out so
contiguous tile blocks are host-local (tile assembly needs no DCN traffic —
each host writes its own image strip; the only cross-host collective is the
``samples`` psum and, for training, the gradient all-reduce inserted by the
shard_map transpose).

This module is exercised single-process via the driver's ``dryrun_multichip``
(virtual CPU mesh); on a real pod slice call :func:`initialize` first.
"""

from __future__ import annotations

import jax
import numpy as np

from jax.sharding import Mesh

from .mesh import TILES_AXIS, SAMPLES_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(n_samples_axis: int = 1) -> Mesh:
    """Global mesh over all processes' devices: hosts stacked along ``tiles``
    (DCN), ``samples`` inside each host (ICI) so the radiance/grad psum rides
    the fast interconnect (scaling-book layout rule)."""
    devs = np.asarray(jax.devices())
    n = devs.size
    if n % n_samples_axis:
        raise ValueError(f"{n} devices not divisible by samples axis {n_samples_axis}")
    return Mesh(devs.reshape(n // n_samples_axis, n_samples_axis),
                (TILES_AXIS, SAMPLES_AXIS))


def host_local_rows(image_height: int, image_width: int,
                    tile_size: int) -> tuple[int, int]:
    """The [start, stop) pixel range whose tiles live on this process —
    for host-local image-strip IO (each host saves only its shard)."""
    n_pix = image_height * image_width
    tiles_total = -(-n_pix // tile_size)
    per_proc = -(-tiles_total // jax.process_count())
    start = jax.process_index() * per_proc * tile_size
    stop = min(n_pix, (jax.process_index() + 1) * per_proc * tile_size)
    return start, stop
