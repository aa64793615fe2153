"""Mesh construction conventions for this framework.

One `jax.sharding.Mesh` spans the slice; axis names are fixed across the
codebase so PartitionSpecs compose:

  data    — batch (DP); gradients/metrics psum here
  tensor  — megatron-style TP (column/row parallel projections)
  expert  — MoE expert parallelism (mixtral)
  pipe    — pipeline stages (parallel/pipeline.py)
  context — sequence/ring-attention parallelism (parallel/ring_attention.py)

Multi-host: `jax.devices()` already spans hosts under jax.distributed; put
`data` (and `pipe`) on the DCN-crossing dimension and keep `tensor`/`expert`
inside a host's ICI domain — `make_mesh` orders axes accordingly
(slowest-varying axis crosses hosts in the device enumeration).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from jax.sharding import Mesh


def make_mesh(
    *,
    data: int = 1,
    pipe: int = 1,
    expert: int = 1,
    tensor: int = 1,
    context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build the canonical mesh. Axis product must equal device count.

    Axis order (slowest to fastest): data, pipe, expert, tensor, context —
    so DCN-crossing axes come first and ICI-local ones last.
    """
    import jax

    devs = np.array(devices if devices is not None else jax.devices())
    shape = (data, pipe, expert, tensor, context)
    total = int(np.prod(shape))
    if total != devs.size:
        raise ValueError(
            f"mesh axes product {total} != device count {devs.size} "
            f"(data={data} pipe={pipe} expert={expert} tensor={tensor} context={context})"
        )
    names = ("data", "pipe", "expert", "tensor", "context")
    # drop singleton axes for cleaner specs? keep all: PartitionSpecs may
    # reference any canonical name; singleton axes shard trivially.
    return Mesh(devs.reshape(shape), axis_names=names)
