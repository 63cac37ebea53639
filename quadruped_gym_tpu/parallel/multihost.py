"""Multi-host setup: jax.distributed + global meshes.

BASELINE targets >= 80% scaling efficiency at >= 2 hosts. The recipe:

    from quadruped_gym_tpu import parallel
    parallel.multihost.initialize()          # once per process, all hosts
    mesh = parallel.multihost.global_mesh()  # all chips across all hosts

Within a host/slice the sample axis reductions ride ICI; across slices the
same psum crosses DCN. Keep the ``data`` (scenario) axis outermost so each
host's scenarios stay local and only the tiny plan/metric reductions cross
hosts (see ``sharded_batch_mppi_plan``).

Single-process runs (and the CI's virtual CPU mesh) work unchanged —
``initialize`` is a no-op when no coordinator is configured.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .mesh import DATA_AXIS, SAMPLE_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env-var fallbacks; returns True when
    a multi-process runtime was actually started.

    Env vars (the standard TPU pod launcher contract): either the args, or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or cloud
    TPU auto-detection (no args at all on a pod slice)."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        # explicitly configured: a failure here is a pod misconfiguration
        # and must crash at startup, not silently degrade every host to an
        # independent single-process run that overwrites shared checkpoints
        try:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                raise
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES"):  # cloud TPU pod slice
        try:
            jax.distributed.initialize()
            return True
        except (RuntimeError, ValueError):
            # already initialized, or a single-process environment that
            # merely looks pod-like (e.g. a tunneled single chip)
            pass
    return False


def global_mesh(
    axis_names: Tuple[str, ...] = (DATA_AXIS, SAMPLE_AXIS),
    data_parallel_per_host: bool = True,
):
    """Mesh over every chip of every host.

    With ``data_parallel_per_host`` the data axis equals the host count, so
    scenario fan-out never crosses DCN and sample reductions stay on ICI."""
    devs = jax.devices()
    nhosts = max(1, jax.process_count())
    if len(axis_names) == 1:
        return make_mesh(devs, axis_names, (len(devs),))
    ndata = nhosts if data_parallel_per_host and len(devs) % nhosts == 0 else 1
    return make_mesh(devs, axis_names, (ndata, len(devs) // ndata))
