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
    test rigs."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process run


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
