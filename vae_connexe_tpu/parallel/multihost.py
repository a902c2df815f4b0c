"""Multi-host initialization.

The reference has no distributed story (SURVEY.md §2); the TPU-native
equivalent needs no hand-written communication layer — ``jax.distributed``
joins the hosts over DCN and every collective in this framework (the psum
the sharded train step's loss mean induces, the seed-sweep axis) then spans
all hosts' devices automatically.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Join a multi-host run.  On TPU pods the arguments are auto-detected;
    returns the global device count."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return len(jax.devices())
