"""Device mesh construction and sharding policy.

This module replaces everything DeepSpeed/NCCL did in the reference
(configs/deepspeed/*.json, torchrun launches in scripts/*.sh): parallelism on
TPU is expressed as a `jax.sharding.Mesh` with named axes plus
`NamedSharding` rules per parameter; XLA inserts the collectives over ICI.

Axes:
  * ``data``  — data parallel (and fully-sharded param/optimizer state, the
                ZeRO-1/2/3 equivalent; reference configs/deepspeed/zero*.json)
  * ``model`` — tensor parallel (Megatron-style sharding of attention heads
                and MLP; the reference has no TP, we add it so the 8B model
                serves comfortably on 16 GiB/chip v5e)
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` means "all remaining devices"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def shardings_for(mesh: Mesh, spec_tree):
    """Map a pytree of PartitionSpecs to NamedShardings on ``mesh``."""
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (replaces torchrun's --master_addr rendezvous,
    reference scripts/ego4d/narration/live1.sh:2-9)."""
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)
