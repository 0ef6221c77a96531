"""Mesh construction and sharding specs for the data-parallel train step.

Multi-host recipe (SPMD over a pod slice; untestable on this single-host
rig but the code path is live and unit-tested in single-process mode):

  1. every process calls `jax.distributed.initialize()` then builds the SAME
     global mesh (`create_mesh((-1,))` over `jax.devices()` — all processes
     see the global device list);
  2. each process loads only its shard of every global batch:
     `BatchIterator(..., shard_index=jax.process_index(),
                    num_shards=jax.process_count())` — the shuffle order is
     a pure function of (seed, epoch), so shards are consistent and disjoint
     across hosts with no coordination;
  3. `global_batch()` (used by Trainer._shard) assembles the global array
     from per-process local shards via
     `jax.make_array_from_process_local_data` — on one host it degrades to
     a plain sharded device_put;
  4. the jitted train step is unchanged: XLA inserts the gradient
     all-reduce over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Sequence[int] = (-1,),
                axis_names: Optional[Sequence[str]] = None,
                devices: Optional[list] = None) -> Mesh:
    """Build a Mesh over the available devices.

    shape: per-axis sizes; a single -1 axis absorbs all remaining devices.
    Default axis names: ('data',) for 1-D, ('data', 'spatial') for 2-D —
    the trainer's supported layouts (tp.py builds ('data', 'model') meshes
    explicitly).
    """
    if axis_names is None:
        axis_names = ("data", "spatial")[:len(list(shape))] or ("data",)
    devices = devices if devices is not None else jax.devices()
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(
            f"create_mesh(shape={tuple(shape)}) needs {n} devices but only "
            f"{len(devices)} are available ({[str(d) for d in devices]}); "
            "for CPU testing set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n} and JAX_PLATFORMS=cpu before the backend initialises.")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def image_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Sharding for image-like arrays (B, H, W, C): batch over 'data' and —
    when the mesh has a 'spatial' axis — H over 'spatial'.

    Spatial partitioning splits every activation H-wise across devices;
    XLA/GSPMD inserts the conv halo exchanges automatically.  It is the TPU
    answer to "the batch doesn't divide by the chip count" / "one image's
    activations blow HBM": scale resolution instead of batch.  `stacked`
    prepends a replicated leading axis for (N, B, H, W, C) multi-step
    batches."""
    spatial = ("spatial",) if "spatial" in mesh.axis_names else ()
    lead = (None,) if stacked else ()
    return NamedSharding(mesh, P(*lead, "data", *spatial))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put a host batch dict with the batch dim split over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def global_batch(x, sharding: NamedSharding):
    """Assemble a globally-sharded array from this process's local data.

    Single-process: a plain sharded device_put (bitwise-identical behavior
    to before).  Multi-process: `x` is this host's shard of the global batch
    (global_batch_size / process_count rows, as produced by a
    process-sharded BatchIterator) and the global jax.Array is assembled
    with `jax.make_array_from_process_local_data` — each host feeds only
    its addressable devices; no cross-host copy of input data ever happens.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
