"""Tests for the operator-string DSL parser, covering every expression shape
that appears in the reference system builders."""

import numpy as np
import pytest

from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.ops.dsl import parse_operator, parse_operator_with_dims


def test_projector():
    m = parse_operator("|1><0|_2")
    assert m.shape == (2, 2)
    assert m[1, 0] == 1.0 and np.count_nonzero(m) == 1


def test_identity_number_boson():
    assert np.allclose(parse_operator("Id_3"), np.eye(3))
    assert np.allclose(parse_operator("n_4"), np.diag([0, 1, 2, 3]))
    b = parse_operator("b_3")
    bd = parse_operator("bdagger_3")
    assert np.allclose(bd, b.conj().T)
    # b|1> = 1|0>, b|2> = sqrt(2)|1>
    assert np.isclose(b[0, 1], 1.0) and np.isclose(b[1, 2], np.sqrt(2))
    # number operator = bdagger b
    assert np.allclose(bd @ b, np.diag([0, 1, 2]))


def test_sum_and_scalar():
    m = parse_operator("1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4")
    assert np.allclose(m, np.diag([0, 1, 1, 2]))


def test_negative_coefficient():
    m = parse_operator("-4*|3><3|_4")
    assert np.allclose(m, np.diag([0, 0, 0, -4]))


def test_otimes_precedence():
    # 2*|1><1|_2 otimes Id_2 == (2*|1><1|_2) otimes Id_2
    m = parse_operator("2*|1><1|_2 otimes Id_2")
    assert np.allclose(m, np.diag([0, 0, 2, 2]))
    m2 = parse_operator("|1><1|_2 otimes Id_2 + Id_2 otimes |1><1|_2")
    assert np.allclose(m2, np.diag([0, 1, 1, 2]))


def test_complex_coefficient():
    # six-level Bz coupling: -i*c*(|2><1|_6 - |1><2|_6) is Hermitian
    m = parse_operator("-i*0.0289*(|2><1|_6 - |1><2|_6)")
    assert np.allclose(m, m.conj().T)
    assert np.isclose(m[2, 1], -1j * 0.0289)


def test_sqrt_and_constants():
    m = parse_operator("sqrt(2)*|1><4|_18")
    assert np.isclose(m[1, 4], np.sqrt(2))
    mat, dims = parse_operator_with_dims("pi*hbar*|0><0|_2")
    assert np.isclose(mat[0, 0], np.pi * hbar)


def test_matrix_product():
    # output op composition like "(|1><0|_2*|0><1|_2)" = |1><1|_2
    m = parse_operator("(|1><0|_2*|0><1|_2)")
    assert np.allclose(m, np.diag([0, 1]))


def test_dims_tracking():
    _, dims = parse_operator_with_dims("|0><0|_4 otimes |0><0|_2 otimes |0><0|_3")
    assert dims == (4, 2, 3)


def test_jc_coupling():
    # Jaynes-Cummings: |1><0|_2 otimes b_3 + |0><1|_2 otimes bdagger_3 Hermitian
    m = parse_operator("|1><0|_2 otimes b_3 + |0><1|_2 otimes bdagger_3")
    assert m.shape == (6, 6)
    assert np.allclose(m, m.conj().T)


def test_scientific_notation():
    m = parse_operator("1e-3*|0><0|_2")
    assert np.isclose(m[0, 0], 1e-3)


def test_errors():
    with pytest.raises(ValueError):
        parse_operator("|2><0|_2")  # index out of bounds
    with pytest.raises(ValueError):
        parse_operator("Id_2 + |0><0|_3")  # shape mismatch
    with pytest.raises(ValueError):
        parse_operator("foo_2")
