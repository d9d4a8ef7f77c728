"""Multi-host scaffolding: two-axis device meshes + jax.distributed init.

The reference is a single Python process (SURVEY.md §2 rows 15-16); this is
the framework's DCN story: a ``Mesh(('host', 'chip'))`` whose "chip" axis
rides ICI within a slice/host and whose "host" axis crosses DCN.  Shardings
place bulk data over both axes flattened; reductions run hierarchically —
intra-host first (ICI), then the few surviving bytes cross hosts.

``initialize_multihost`` wraps ``jax.distributed.initialize``; on CPU the
collectives run over gloo (``jax_cpu_collectives_implementation``), which is
how the 2-process dryrun (``scratch``-free, see tests/test_multihost.py and
``__graft_entry__.dryrun_multihost``) exercises the code path without a pod.
"""

from __future__ import annotations

import os

HOST_AXIS = "host"
CHIP_AXIS = "chip"


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (multi-host).  On TPU pods the
    arguments are auto-detected; on CPU test rigs pass them explicitly and
    set gloo collectives."""
    import jax
    # Must not touch the backend (jax.devices/default_backend) before
    # distributed init — decide CPU-ness from the environment only.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older jax
            pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh2(num_hosts: int | None = None,
               chips_per_host: int | None = None):
    """Two-axis Mesh (host, chip) over the global device list.

    Defaults: num_hosts = jax.process_count(), chips from what remains.
    Works both under real multi-process runs and single-process simulated
    meshes (where "host" is a logical axis over local devices).
    """
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = jax.devices()
    if num_hosts is None:
        num_hosts = max(jax.process_count(), 1)
    total = len(devices)
    if chips_per_host is None:
        chips_per_host = total // num_hosts
    assert num_hosts * chips_per_host <= total
    grid = np.array(devices[:num_hosts * chips_per_host]).reshape(
        num_hosts, chips_per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def flat_spec(rank: int, axis_index: int):
    """PartitionSpec sharding dimension ``axis_index`` over BOTH mesh axes
    (host-major), other dims replicated."""
    from jax.sharding import PartitionSpec as P
    spec = [None] * rank
    spec[axis_index] = (HOST_AXIS, CHIP_AXIS)
    return P(*spec)


def msm_multihost(mesh, points, scalars_limbs, curve_type: str = "bn254",
                  impl: str = "fused"):
    """MSM with points/scalars sharded over (host, chip): per-device
    partial MSMs, hierarchical combine — all_gather over the chip axis,
    local tree-add, all_gather the per-host partial over the host axis
    (DCN carries one point per host), final add.

    points (3, L, N) Z=1 affine; N divisible by mesh size * 1024.
    ``impl``: "fused" (the VMEM bucket kernel / its XLA reference) or
    "small" (direct batched double-and-add — compiles in seconds; used by
    the CPU dryrun, where the fused reference costs ~10 min of XLA:CPU
    compile per process).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.msm_kernel import fused_msm
    from ..ops.msm import _small_msm_core
    from ..ops.fr import LIMB_BITS

    fm = fused_msm(curve_type)
    curve = fm.curve
    H, C = mesh.devices.shape

    def _partial(pts2, limbs2):
        if impl == "small":
            Ls = limbs2.shape[0]
            bit_rows = [(limbs2[i] >> j) & 1
                        for i in range(Ls) for j in range(LIMB_BITS)]
            bits = jnp.stack(bit_rows, axis=0).astype(jnp.uint32)
            return _small_msm_core(curve, pts2, bits)
        return fm.msm_prepared(fm.prepare_points(pts2), limbs2)

    def local(pts, limbs):
        part = _partial(pts[:, :, 0], limbs[:, 0])   # (3, L, 1)
        # intra-host (ICI) combine
        chip_parts = jax.lax.all_gather(part, CHIP_AXIS, axis=2, tiled=True)
        acc = chip_parts[:, :, :1]
        for i in range(1, C):
            acc = curve.add_xla(acc, chip_parts[:, :, i:i + 1])
        # inter-host (DCN) combine: one point per host crosses the wire
        host_parts = jax.lax.all_gather(acc, HOST_AXIS, axis=2, tiled=True)
        total = host_parts[:, :, :1]
        for i in range(1, H):
            total = curve.add_xla(total, host_parts[:, :, i:i + 1])
        return total

    # reshape to expose a (host*chip) shard axis: (3, L, D, N/D)
    D = H * C
    L = points.shape[1]
    N = points.shape[-1]
    pts = points.reshape(3, L, D, N // D)
    Ls = scalars_limbs.shape[0]
    lb = scalars_limbs.reshape(Ls, D, N // D)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, (HOST_AXIS, CHIP_AXIS), None),
                  P(None, (HOST_AXIS, CHIP_AXIS), None)),
        out_specs=P(None, None, None),
        check_vma=False)
    out = jax.jit(fn)(pts, lb)
    return out
