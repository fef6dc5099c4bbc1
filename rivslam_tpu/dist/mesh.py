"""Device-mesh construction and sharding helpers.

New capability vs the reference (which has no distributed backend at all,
SURVEY.md §2.5): scaling is expressed as a 2-axis `jax.sharding.Mesh` —
`data` parallelism over independent sequences / frame pairs, and `model`
parallelism over points within one registration problem (the OpenMP
point-loop axis, re-expressed as a sharded array dimension whose H/b
reduction becomes a psum over ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
