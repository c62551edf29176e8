"""Device meshes and shardings.

The reference has NO multi-device support (every session pins one GPU,
train.py:42, inference_*.py:56-57); this module is the net-new TPU-native
parallel layer (SURVEY §2.9, §5.8):

* axis ``data`` — batch sharding for data-parallel training; gradients are
  all-reduced over ICI by XLA (GSPMD) because parameters are replicated
  while the batch is sharded.
* axis ``mc`` — the MC-dropout sample axis of epistemic inference, sharded
  so T samples split across chips (the repo's one real parallel axis,
  SURVEY §2.9).

Multi-host: call ``jax.distributed.initialize()`` before building meshes;
``jax.devices()`` then spans hosts and the same shardings ride ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs):
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper.

    Call once per host before building meshes; afterwards ``jax.devices()``
    spans all hosts, intra-slice collectives ride ICI and cross-slice
    traffic rides DCN.  No-ops when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized / no coordinator
        import logging

        logging.getLogger("byolo.mesh").info("distributed init skipped: %s", e)


def maybe_initialize_from_config(config) -> bool:
    """Multi-host bring-up from Config (SURVEY §5.8): no-op unless
    ``coordinator_address`` is set; returns True when distributed mode is
    active.  Must run before any mesh/device query."""
    if not getattr(config, "coordinator_address", ""):
        return False
    initialize_distributed(
        coordinator_address=config.coordinator_address,
        num_processes=config.num_processes,
        process_id=config.process_id,
    )
    return True


def make_mesh(
    shape: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a named mesh.

    ``shape`` maps axis name -> size (e.g. {'data': 4, 'mc': 2}); default is
    all visible devices on one ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh shape {shape} does not cover {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch or sample) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict, axis: str = "data") -> Dict:
    """Place a host batch dict with its leading dim sharded over ``axis``.

    Multi-host: each process passes its LOCAL slice of the global batch
    (global_batch / process_count rows); the slices are assembled into one
    global array (``jax.make_array_from_process_local_data``).  Single-host:
    a plain sharded device_put.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a (host-identical) pytree over every device of ``mesh``.

    Multi-host: every process must hold the same values (deterministic init
    from a shared seed); assembled via make_array_from_process_local_data,
    which for a replicated sharding expects the full array on each host.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)
