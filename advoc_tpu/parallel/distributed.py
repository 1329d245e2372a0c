"""Multi-host initialization (SURVEY.md §5 comm-backend row).

The reference has no distributed execution; the TPU-native answer is JAX's
built-in runtime: call :func:`initialize` once per host process before any
device use, then every ``jax.devices()`` mesh spans the full slice and the
DP/SP code in this package works unchanged — XLA routes collectives over ICI
within a slice and DCN across slices. Nothing custom to transport.

Single-host (this machine: 1 chip) is a no-op, so all entry points can call
it unconditionally.
"""

from __future__ import annotations

import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if running multi-host; returns True if so.

    With no arguments, auto-detects from the standard env (JAX/TPU pod
    runtimes set these); explicitly single-host environments return False
    without touching the runtime.
    """
    import jax

    multi = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
    )
    if not multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
