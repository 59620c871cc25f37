"""Device-mesh construction.

Replaces the reference's cluster-topology builder (set_dist_env,
DeepFM.py:237-282: static ps/worker host lists -> TF_CONFIG -> gRPC
parameter servers). On TPU the topology is a jax.sharding.Mesh with two
logical axes:

  "data"   batch sharding (sync data parallelism; gradient all-reduce
           over ICI replaces async PS push/pull)
  "model"  embedding-table row sharding (the parameter-server analog)

dist_mode mapping: 0/1/2 all collapse to "use every visible device";
multi-host topologies come from jax.distributed.initialize (see
parallel/distributed.py), after which jax.devices() spans all hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
