"""Device-mesh helpers.

The reference has no distribution layer at all (SURVEY.md §2 rows 15-16);
this module is the framework's L0': a thin wrapper over ``jax.sharding.Mesh``
used by the distributed NTT (``ntt_dist``) and MSM (``msm_dist``).  One
mesh axis ("shard") suffices for this domain: polynomial coefficients and
MSM points are 1-D objects sharded along it, with ICI collectives
(all_to_all for NTT transposes, all_gather for MSM partial sums) doing the
cross-chip movement.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))


def shard_axis(mesh: Mesh, axis_index: int, rank: int) -> NamedSharding:
    """NamedSharding placing ``AXIS`` on dimension ``axis_index`` of a
    rank-``rank`` array."""
    spec = [None] * rank
    spec[axis_index] = AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
