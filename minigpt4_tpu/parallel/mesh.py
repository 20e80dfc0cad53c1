"""Device mesh construction.

The reference is single-host/single-process (SURVEY §2.3: no DP/TP/PP);
parallelism here is designed in from the start as sharding specs over a
``jax.sharding.Mesh`` with axes:

    dp — data parallel (batch / concurrent sessions)
    tp — tensor parallel (attention heads + FFN columns over ICI)

A single v5e chip is the baseline (mesh 1x1 — no collectives inserted);
multi-chip 13B TP is a sharding-spec change, not an architecture change.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def single_chip_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
