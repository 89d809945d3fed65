"""Device mesh + sharding helpers (the TPU-native parallelism layer).

The reference's only live parallelism is single-process
``torch.nn.DataParallel`` (replicate module, scatter batch, gather outputs
— ``buffer.py:51-53``, ``distill.py:443-445``) plus dead NCCL/DDP
scaffolding (``utils.py:847-869``).  The TPU-native equivalent is a single
jitted program over a :class:`jax.sharding.Mesh`: batches are sharded on a
``data`` axis, parameters are replicated, and XLA inserts the ``psum``
collectives over ICI.  A ``model`` axis is provisioned for tensor-sharding
larger backbones.

Multi-host: call :func:`maybe_init_distributed` first; the mesh then spans
all processes' devices and per-host data feeding uses
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (on by default).

    The headline NFNet-L0 distill step takes O(10 min) to compile; the
    reference pays the analogous warm-up (CUDA kernel autotuning) far
    less, so restart latency is a real TPU-native cost — the cache turns
    every re-run/resume of an identical program into a cache hit.  Set
    ``MDD_TPU_NO_COMPILE_CACHE=1`` to disable, ``JAX_COMPILATION_CACHE_DIR``
    to relocate (default ``~/.cache/mdd_tpu/xla``).
    """
    if os.environ.get("MDD_TPU_NO_COMPILE_CACHE") == "1":
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/mdd_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # older jax or read-only FS — run uncached
        print(f"[mesh] compilation cache disabled: {e}")


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX if a coordinator is configured.

    Safe no-op on single-host (the common bench/test case).  This is the
    live replacement for the reference's dead ``init_distributed_mode``
    (``utils.py:847-869``, which reads RANK/WORLD_SIZE/SLURM and calls
    ``init_process_group(backend='nccl')`` but is never invoked).  Here:
    set ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` and
    ``JAX_PROCESS_ID`` outside auto-detectable environments) and every
    entry point becomes multi-host — the mesh then spans all processes'
    devices, batches are fed per-host via :func:`host_local_to_global`,
    and XLA runs collectives over ICI/DCN.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES") is not None:
        kwargs = dict(coordinator_address=addr,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # already initialized or unavailable
        print(f"[mesh] jax.distributed.initialize skipped: {e}")


def host_local_to_global(mesh: Mesh, batch, axis: str = "data"):
    """Assemble per-process batch shards into global ``jax.Array``s.

    Each process passes only ITS slice of the global batch (dim 0,
    process-major order — the order :class:`~..data.pipeline.Loader`
    emits with ``shard=(process_index, process_count)``); the result is a
    global array sharded over ``axis``, ready for a jitted step over a
    multi-process mesh.  Single-process: plain device_put with the same
    sharding (no-op semantics, same return type).
    """
    nproc = jax.process_count()

    def _put(x):
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim, axis)
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(_put, batch)


def process_shard(n: int, drop_remainder: bool = True) -> Tuple[int, int]:
    """This process's contiguous [start, stop) of a length-``n`` global
    batch axis (process-major, matching ``jax.devices()`` order)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    if drop_remainder:
        per = n // nproc
        return pid * per, (pid + 1) * per
    starts = np.linspace(0, n, nproc + 1).astype(int)
    return int(starts[pid]), int(starts[pid + 1])


def expert_assignment(num_experts: int) -> Sequence[int]:
    """Which phase-1 experts THIS process trains (expert-per-host
    fan-out).  Experts are embarrassingly independent (``buffer.py:42``),
    so hosts round-robin them — each host trains its subset on its local
    devices and writes buffer files under the expert's global index, with
    zero cross-host traffic."""
    return list(range(jax.process_index(), num_experts,
                      max(1, jax.process_count())))


def get_mesh(mesh_shape: Sequence[int] = (),
             axis_names: Sequence[str] = ("data",),
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; defaults to all devices on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devices),)
        axis_names = tuple(axis_names[:1]) or ("data",)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(mesh_shape)} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest (DataParallel scatter)."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of host arrays with dim-0 sharded over the mesh."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
    return jax.tree_util.tree_map(_put, batch)


@lru_cache(maxsize=None)
def data_axis_size(mesh_shape: Tuple[int, ...] = ()) -> int:
    return get_mesh(mesh_shape).shape.get("data", 1)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of ``k`` >= ``n`` (static-shape friendly batching)."""
    return ((n + k - 1) // k) * k
