"""Multi-host (DCN) runtime for the sharded receiver.

The reference is single-host; its distribution side-channels are TCP
protocols (SURVEY.md §5.8).  The TPU build scales past one host with
the standard JAX multi-process runtime:

- :func:`initialize` — `jax.distributed` bring-up (coordinator +
  process id), idempotent, no-op for single-process runs;
- :func:`make_hybrid_mesh` — a ("time", "ch") mesh laid out so the
  axes' traffic matches the fabric: the **time** axis (overlap-save
  halo ppermutes + PSD psum every block) stays WITHIN a process/slice
  (ICI), and the **ch** axis (zero per-step communication — channels
  are independent) spans processes (DCN).  This is the
  collectives-ride-ICI rule of the scaling playbook;
- :func:`host_array` — wrap per-host input blocks into a global array
  (`jax.make_array_from_process_local_data`), the DCN block-scatter of
  SURVEY.md §5.8;
- :func:`local_outputs` — each host's addressable output shards (its
  own channels' audio/symbols), i.e. the result gather is implicit:
  every host drains exactly the channels it serves.

Usage (same program on every host):

    distributed.initialize(coord, n_procs, pid)
    mesh = distributed.make_hybrid_mesh(n_time=4)
    step = shard_pipeline(cfg, mesh)(consts, state)
    xg = distributed.host_array(mesh, P("time"), x_block)
    state, out = step(consts, state, xg)
    audio = distributed.local_outputs(out["audio"])
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    With no arguments, runs single-process (no-op) or picks up cluster
    autodetection (TPU pod environments set the variables).
    """
    global _initialized
    if _initialized:
        return
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        _initialized = True
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address)
        _initialized = True


def make_hybrid_mesh(n_time: int | None = None,
                     n_ch: int | None = None,
                     devices=None) -> Mesh:
    """("time", "ch") mesh with time within a process, ch across.

    Devices are grouped by process; within each process's local grid
    the time axis varies fastest, so halo ppermutes stay on ICI; the
    channel axis concatenates process groups, so its (nonexistent)
    per-step traffic is all that rides DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_proc = max((d.process_index for d in devices), default=0) + 1
    per_proc = len(devices) // n_proc
    if n_time is None:
        n_time = per_proc if n_ch is None else len(devices) // n_ch
    if n_ch is None:
        n_ch = len(devices) // n_time
    assert n_time * n_ch == len(devices), \
        f"{n_time}x{n_ch} != {len(devices)} devices"
    assert per_proc % n_time == 0 or n_time % per_proc == 0 or \
        n_time <= per_proc, \
        "time axis must not straddle process boundaries"
    assert n_time <= per_proc, (
        f"time axis ({n_time}) exchanges halos every block and must "
        f"fit within one process's devices ({per_proc})")
    by_proc = [[] for _ in range(n_proc)]
    for d in devices:
        by_proc[d.process_index].append(d)
    cols = []
    for group in by_proc:
        # local grid [n_time, per_proc // n_time]
        g = np.array(group, dtype=object).reshape(
            per_proc // n_time, n_time).T
        cols.append(g)
    grid = np.concatenate(cols, axis=1)
    return Mesh(grid, axis_names=("time", "ch"))


def host_array(mesh: Mesh, spec: P, local_data: np.ndarray,
               global_shape: tuple | None = None):
    """Per-process input block → global sharded array (DCN scatter).

    For the receiver input (sharded on "time", replicated on "ch"),
    every process passes the SAME full block; for channel-major data
    each process passes its channels' slice.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, local_data, global_shape)


def local_outputs(arr) -> list[tuple[tuple, np.ndarray]]:
    """This host's addressable shards as (index, data) pairs — the
    implicit result gather: each host consumes its own channels."""
    return [(s.index, np.asarray(s.data))
            for s in arr.addressable_shards]


def process_channels(mesh: Mesh, n_channels: int) -> slice:
    """The contiguous channel range this process's devices own when
    [C]-leading arrays are sharded P("ch")."""
    ch_devs = list(mesh.devices.flatten())
    n_ch = mesh.shape["ch"]
    per = n_channels // n_ch
    # find this process's ch-axis positions
    mine = [j for j in range(n_ch)
            if mesh.devices[0, j].process_index == jax.process_index()]
    if not mine:
        return slice(0, 0)
    del ch_devs
    return slice(min(mine) * per, (max(mine) + 1) * per)
