"""Multi-controller (multi-host) runtime support.

The reference is a single Windows process (SURVEY.md §2.4); this module is
the JAX-native scale-out story for campaigns that span hosts: every
controller runs the SAME host program, the device mesh spans all
processes, and the per-iteration collectives (psum of the 6x6 normal
equations, all_gather of percentile distances) ride whatever links connect
the devices — ICI within a host, DCN across hosts.  No reformulation of
the pipeline is needed: the staged loop's host control flow consumes only
fully-replicated scalars, so every controller takes identical branches.

The same code path is exercised hardware-free by ``eval/distributed_demo``
and ``tests/test_distributed.py``: two OS processes x 4 virtual CPU
devices each, coordinated through ``jax.distributed.initialize`` — the
collectives then cross the process boundary over the gRPC/TCP backend,
which is exactly the role DCN plays on a real pod slice (SURVEY.md §5,
§7 step 5).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_worker(coordinator_address: str, num_processes: int,
                      process_id: int,
                      local_cpu_devices: int | None = None) -> None:
    """Join this process to a multi-controller JAX job.

    Call BEFORE any other JAX API.  With ``local_cpu_devices`` set, the
    process contributes that many virtual CPU devices — the hardware-free
    simulation of one host of a pod slice.
    """
    if local_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def fetch(x) -> np.ndarray:
    """Device→host fetch that also works for globally-sharded arrays.

    Fully-addressable arrays (single controller, or replicated outputs)
    take the direct path; arrays whose shards live on other processes are
    materialised with one ``process_allgather`` — the only cross-host
    host-side transfer the pipeline ever performs (the brute percentile
    fallback and the final stable-point mask).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def is_multiprocess() -> bool:
    return jax.process_count() > 1
