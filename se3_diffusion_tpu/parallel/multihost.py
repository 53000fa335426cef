"""Multi-host initialization + profiling hooks.

The reference's NCCL/torchrun plumbing (`train_se3_diffusion.py:83-91`,
`experiments/utils.py:13-18`) maps to `jax.distributed.initialize()` plus
per-process data striding (already a pure function of process_index in
`data.dataset.PdbDataset.epoch_indices`). This module is the thin
operational layer: initialize once, expose rank info, and provide the
`jax.profiler` trace context the reference lacks (SURVEY.md section 5.1).
"""
from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initializes jax.distributed when running multi-host (no-op on one
    host). Returns {'process_index', 'process_count', 'local_devices'}."""
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    # IMPORTANT: do not touch jax.process_count()/devices() before
    # jax.distributed.initialize — any backend query initializes the local
    # backend and the distributed service can no longer join the job.
    already = getattr(jax._src.distributed.global_state, "client", None)
    if explicit and already is None:
        # Only read the env-var fallbacks when BOTH are present; otherwise
        # pass None through so jax.distributed.initialize can auto-detect
        # from the cluster environment (or fail loudly) instead of
        # silently splitting the launch into independent rank-0 jobs.
        env_np = os.environ.get("NUM_PROCESSES")
        env_pid = os.environ.get("PROCESS_ID")
        if num_processes is None and process_id is None:
            if env_np is not None and env_pid is not None:
                num_processes = int(env_np)
                process_id = int(env_pid)
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
    }


def is_main_process() -> bool:
    """Rank-0 gating for logging/checkpointing (the reference's
    rank-silencing, `train_se3_diffusion.py:87-91`)."""
    return jax.process_index() == 0


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy.

    Usage: with profiler_trace('/tmp/profile'): step(...)
    View with tensorboard or xprof.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
