"""Device mesh + sharding helpers (the SPMD substrate).

Replaces the reference's torch.distributed/NCCL machinery
(css/training/train.py:115-154, utils/torch_utils.py) with JAX SPMD:

* a Mesh over all (local or distributed) devices with a data axis 'dp'
  (and an optional model axis 'mp' for tensor-parallel serving of large
  models);
* batch sharding via NamedSharding(P('dp', ...)); parameters replicated.
  Under jit, XLA inserts the gradient all-reduce over ICI — the DDP
  equivalent with zero framework code;
* session sharding for inference: deal sessions round-robin across
  processes (the DDPRowIterator equivalent, minus the dummy-row padding —
  single-controller JAX needs no collective-call alignment).

Multi-host: call jax.distributed.initialize() before any jax op (env-driven,
no-op for single host).
"""
import os
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """jax.distributed.initialize from env (torchrun-style), no-op single."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(devices: Optional[List] = None, dp: Optional[int] = None,
              mp: int = 1, dp_axis: str = "dp", mp_axis: str = "mp") -> Mesh:
    """1-D or 2-D mesh over devices: [dp, mp]."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % mp == 0
        dp = n // mp
    assert dp * mp <= n
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (dp_axis, mp_axis))


def data_sharding(mesh: Mesh, ndim: int, dp_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P(dp_axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, dp_axis: str = "dp") -> dict:
    """Assemble a global batch dict with the batch axis sharded over dp.

    Single-process: a plain device_put with NamedSharding; ragged final
    batches (size not divisible by the dp extent) fall back to replication —
    correctness first; the training loader drops the remainder anyway, so
    this only affects the tail of evaluation.

    Multi-process: each process passes its *process-local* rows and the
    global array is assembled with jax.make_array_from_process_local_data
    (a bare device_put would misread the local rows as the global array and
    silently shrink the effective global batch). Ragged tails are trimmed to
    the local-device multiple — shards are loader-padded to equal sizes, so
    every process trims identically and stays in SPMD lockstep.
    """
    dp = mesh.shape[dp_axis]
    multi = jax.process_count() > 1
    if multi:
        # rows of the global batch this process holds = number of distinct
        # dp-coordinates among its addressable mesh devices
        axes = list(mesh.axis_names)
        devs = np.moveaxis(mesh.devices, axes.index(dp_axis), 0)
        pid = jax.process_index()
        local_dp = sum(any(d.process_index == pid for d in row.flatten())
                       for row in devs)
        assert local_dp > 0, "mesh has no devices on this process"
    out = {}
    for k, v in batch.items():
        if not (isinstance(v, np.ndarray) and v.ndim >= 1):
            out[k] = v
            continue
        if multi:
            n = (v.shape[0] // local_dp) * local_dp
            if n == 0:
                raise ValueError(
                    f"local batch {v.shape[0]} < local device count "
                    f"{local_dp}; raise global_batch_size")
            sh = data_sharding(mesh, v.ndim, dp_axis)
            out[k] = jax.make_array_from_process_local_data(sh, v[:n])
        elif v.shape[0] % dp == 0:
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim, dp_axis))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def barrier(name: str = "sync"):
    """Cross-process barrier (multi-host); no-op single-process.

    Replaces torch.distributed.barrier (utils/torch_utils.py:33-36).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def all_reduce_max_host(value: int) -> int:
    """Max of a host-side integer across processes (the reference's
    all_reduce-MAX word-count equalizer, utils/torch_utils.py:116-123)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    import jax.numpy as jnp
    arr = multihost_utils.process_allgather(np.asarray(value))
    return int(np.max(arr))


def gather_dicts_to_zero(d: dict) -> Optional[list]:
    """Gather per-process python dicts of floats to process 0 (the
    reduce_dict_to_rank0 equivalent, utils/torch_utils.py:159-185)."""
    if jax.process_count() == 1:
        return [d]
    from jax.experimental import multihost_utils
    keys = sorted(d)
    arr = np.asarray([float(d[k]) for k in keys])
    gathered = multihost_utils.process_allgather(arr)
    if jax.process_index() != 0:
        return None
    return [dict(zip(keys, row)) for row in np.atleast_2d(gathered)]


def shard_sessions(num_sessions: int, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> List[int]:
    """Strided round-robin session assignment for this process.

    Equivalent to DDPRowIterator (utils/torch_utils.py:48-99) without the
    dummy-row padding: JAX inference here issues no cross-process
    collectives per session, so ranks need not stay in lockstep.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, num_sessions, pc))
