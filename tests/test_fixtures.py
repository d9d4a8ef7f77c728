"""Fixture unpickler tests against the facts recorded in SURVEY.md §2
(rows 13-14): matrix shapes, nnz counts, public inputs, satisfiability."""

from kzg_snark_tpu.ops.host.field import scalar_field

Fr = scalar_field("bn254")


def test_r1cs_shape_and_nnz(r1cs_instance):
    inst = r1cs_instance
    assert inst.A.nrows() == inst.A.ncols() == 16
    assert len(inst.A.nonzero_positions()) == 20
    assert len(inst.B.nonzero_positions()) == 16
    assert len(inst.C.nonzero_positions()) == 16
    assert len(inst.z) == 16


def test_r1cs_public_inputs(r1cs_instance):
    z = r1cs_instance.z
    assert z[0] == 1
    assert z[1] == Fr(-34)
    assert z[2] == 1785475660349
    assert z[3] == 1156


def test_r1cs_satisfied(r1cs_instance):
    assert r1cs_instance.check_satisfied()


def test_plonk_shape(plonk_instance):
    inst = plonk_instance
    n = len(inst.qM)
    assert n == 16
    assert len(inst.perm) == 3 * n
    assert sorted(inst.perm) == list(range(3 * n))
    assert len(inst.w) == 3 * n


def test_plonk_public_inputs(plonk_instance):
    assert [int(v) for v in plonk_instance.w[:5]] == [7, 11, 13, 17, 19]


def test_plonk_satisfied(plonk_instance):
    assert plonk_instance.check_satisfied()


def test_matrix_transpose_and_scale(r1cs_instance):
    A = r1cs_instance.A
    At = A.T
    for (i, j) in A.nonzero_positions():
        assert At[j, i] == A[i, j]
    # scale then check a column
    B = A.T
    B.scale_column(0, Fr(3))
    for i in range(16):
        assert B[i, 0] == At[i, 0] * 3
