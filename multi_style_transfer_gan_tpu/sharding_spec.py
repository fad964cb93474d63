"""Marker types that thread sharding intent into model forwards.

Leaf module (imports jax only) so both ``models/*`` and ``parallel/*`` can
depend on it without cycles: the model code dispatches on the marker, the
parallel layer constructs it.
"""

from __future__ import annotations

from typing import NamedTuple

from jax.sharding import Mesh


class ShardedFastAttention(NamedTuple):
    """``fast_attention`` value for height-sharded (GSPMD spatial) runs.

    The Pallas window kernels are per-shard programs: under plain GSPMD a
    ``pallas_call`` traced at the GLOBAL shape would force XLA to gather the
    sharded activation onto every device. Windowed channel attention and the
    transformer's window MHSA are height-LOCAL (windows never cross the
    16-row shard boundaries the spatial path guarantees), so the TPU-native
    fix is ``jax.shard_map``: run the same fast kernel on each height shard
    with replicated weights — zero collectives, identical math
    (parallel/spatial.py; round-1 weakness #4).

    Hashable (NamedTuple of a Mesh + str) so it can ride in jit closures.
    """

    mesh: Mesh
    axis: str = "sp"
