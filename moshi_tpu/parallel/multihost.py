"""Multi-host (pod-slice) initialization and session routing.

The reference has no distributed layer at all (SURVEY.md §2.7); this is
the TPU-native design: every host runs the SAME jitted program under
`jax.distributed` — XLA partitions weights/KV over the global mesh
(`model` axis rides ICI inside a slice; the `data`/sessions axis spans
hosts over DCN), and each host feeds/reads only its addressable shard of
the session batch.

Usage (one process per host):
    from moshi_tpu.parallel import multihost
    multihost.initialize()                    # env-driven (TPU pods auto)
    mesh = multihost.global_mesh(model=4)     # data axis = rest
    # shard params/state with parallel.sharding pspecs, then serve
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize — on TPU pods all arguments are
    auto-detected from the metadata server; pass explicitly for CPU/GPU
    test rigs.

    Must run before anything touches a backend (jax.devices(),
    jax.process_count(), any device_put) — so the already-initialized
    check reads the distributed client state directly instead of calling
    jax.process_count(), which would itself initialize a local backend
    and silently turn the run single-process."""
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return  # already initialized
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # no auto-detectable cluster: single-process run


def global_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices; `model` should
    divide the per-slice device count so TP collectives stay on ICI."""
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    return Mesh(devices.reshape(n // model, model), ("data", "model"))


def local_batch_slice(global_batch: int) -> slice:
    """The rows of the global session batch this host owns (data axis is
    sharded evenly over processes)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
