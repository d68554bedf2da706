"""Multi-host initialization.

One call sets up the jax distributed runtime for multi-host TPU slices
(replacing the reference's mpi4py rendezvous + torch.distributed port
negotiation, data/PPG/phasic_policy_gradient/torch_util.py:125-284).  On
Cloud TPU the coordinator/process ids come from the environment
automatically; explicit args cover manual clusters.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Returns (process_index, process_count).
    """
    if coordinator_address is not None:
        # explicit coordinator: a failure here is a real misconfiguration —
        # swallowing it would silently degrade the job to N independent
        # single-process runs writing conflicting checkpoints
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            # Cloud TPU / GKE: everything is discoverable from the metadata env
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # single-process run (already initialized, or no cluster env)
            pass
    return jax.process_index(), jax.process_count()
