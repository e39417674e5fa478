"""Multi-host bring-up: jax.distributed + global mesh helpers.

The reference has no distributed communication at all (SURVEY.md §5);
TPU-natively this is ~nothing to hand-write: jax.distributed.initialize
wires the hosts, and all collectives are emitted by XLA from sharding
annotations. This module is the thin, idempotent entry point plus a
global-mesh constructor for multi-slice (ICI within a slice, DCN across).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed once, from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU metadata autodetection). Returns True if running multi-process."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get("JAX_NUM_PROCESSES") is None:
        # single-process (e.g. one TPU VM) — nothing to initialize
        _initialized = True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    _initialized = True
    return jax.process_count() > 1


def global_mesh(n_model: int = 1) -> Mesh:
    """('data','model') mesh over ALL processes' devices. The 'data' axis is
    laid out host-major so stem shards stay host-local and the CFG fold plus
    stem batching ride ICI; only keyframe gathers ever cross DCN."""
    devices = np.asarray(jax.devices())
    n_data = len(devices) // n_model
    return Mesh(devices[: n_data * n_model].reshape(n_data, n_model), ("data", "model"))
