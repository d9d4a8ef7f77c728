"""Multi-host scaffolding: 2-process CPU dryrun (VERDICT r1 next-round #8).

Spawns two worker processes, each with 4 simulated CPU devices, joined by
``jax.distributed`` (gloo CPU collectives) into a ``Mesh(('host','chip'))``
of shape (2, 4); runs the hierarchically-combined MSM against the host
oracle.  Subprocess-based because jax.distributed must initialize before
any backend use in each worker.
"""

import pytest


@pytest.mark.slow
def test_multihost_two_process_dryrun():
    from kzg_snark_tpu.parallel.multihost_dryrun import launch
    launch(nprocs=2, port=49753, timeout=2000)


def test_make_mesh2_single_process():
    jax = pytest.importorskip("jax")
    from kzg_snark_tpu.parallel.multihost import make_mesh2, flat_spec
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device simulated mesh")
    mesh = make_mesh2(num_hosts=2, chips_per_host=4)
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (2, 4)
    spec = flat_spec(3, 2)
    assert spec[2] == ("host", "chip")
