"""Device mesh construction (SURVEY.md section 3, component 24).

Axes: 'data' shards the codeword batch; 'seq' shards the trellis of long
blocks for cross-device sliding-window BCJR (component 23).  Collectives
ride ICI within a slice and DCN across hosts; the mesh is constructed so
'seq' maps to adjacent devices (ppermute neighbors are physical neighbors).
"""

from __future__ import annotations

import jax
import numpy as np


def make_mesh(data: int | None = None, seq: int = 1,
              devices=None) -> jax.sharding.Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    assert data * seq <= n, f"mesh {data}x{seq} needs {data*seq} devices, have {n}"
    devs = np.asarray(devices[:data * seq]).reshape(data, seq)
    return jax.sharding.Mesh(devs, ("data", "seq"))
