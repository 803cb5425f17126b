"""Platform capability probes.

The axon TPU tunnel registers a PJRT plugin that reports itself as a plain
``tpu`` backend (``jax.default_backend() == "tpu"``), but it cannot lower
host send/recv callbacks: any program containing ``jax.debug.print`` /
``io_callback`` / ``pure_callback`` fails to compile with
``UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks``.
Detect it by its environment (the tunnel always exports PALLAS_AXON_* /
AXON_* variables) so optional diagnostics can be elided from traced
programs on that platform.
"""

from __future__ import annotations

import os


def on_axon_tunnel() -> bool:
    """True when the TPU is reached through the axon tunnel plugin."""
    return any(k.startswith(("AXON_", "PALLAS_AXON_")) for k in os.environ)


def host_callbacks_unsupported() -> bool:
    """True when jax.debug.print / io_callback cannot be lowered on the
    current default backend (axon tunnel; CPU and real TPU support them)."""
    import jax
    return jax.default_backend() != "cpu" and on_axon_tunnel()
