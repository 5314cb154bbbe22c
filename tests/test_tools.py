"""Tests for the toolbox: grids, dm composition, concurrence, superoperators.

Ports the reference's two real unit tests (tests/test_output_ops.py,
tests/test_merge_interval.py) into assertions, plus new coverage."""

import numpy as np

from pyaceqd_tpu import tools
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.pulses import Pulse


def test_merge_intervals():
    assert tools._merge_intervals([[0, 1], [1, 2]]) == [[0, 2]]
    assert tools._merge_intervals([[0, 1], [2, 3]]) == [[0, 1], [2, 3]]
    assert tools._merge_intervals([[0, 5], [1, 2]]) == [[0, 5]]
    assert tools._merge_intervals([[0, 2], [1, 5], [4, 6], [8, 9]]) == [[0, 6], [8, 9]]


def test_construct_t():
    p1 = Pulse(tau=3, e_start=0, t0=20)
    t = tools.construct_t(0, 60, 0.2, 2.0, None, p1)
    t = np.asarray(t)
    assert t[0] == 0 and t[-1] == 60
    assert np.all(np.diff(t) > 0)
    # fine sampling inside the pulse window
    inside = t[(t > 12) & (t < 28)]
    assert np.allclose(np.diff(inside), 0.2)


def test_output_ops_dm_roundtrip():
    # reference tests/test_output_ops.py: operator strings for composite spaces
    ops = tools.output_ops_dm(dim=[2, 2])
    assert len(ops) == 4 * 5 // 2  # upper triangle of 4x4
    assert ops[0] == "|0><0|_2 otimes |0><0|_2"
    # round-trip: build a random hermitian rho, compute the outputs, recompose
    rng = np.random.default_rng(0)
    d = 4
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = a @ a.conj().T
    rho /= np.trace(rho)
    from pyaceqd_tpu.ops.dsl import parse_operator
    outputs = [np.array([0.0])]
    for s in tools.output_ops_dm(dim=[2, 2]):
        O = parse_operator(s)
        outputs.append(np.array([np.trace(O @ rho)]))
    t, rho2 = tools.compose_dm(outputs, dim=4)
    # reference convention stores Tr(|j><k| rho) = rho[k,j] at [j,k] -> transpose
    assert np.allclose(rho2[0], rho.T) or np.allclose(rho2[0], rho)


def test_concurrence_bell_state():
    # maximally entangled Bell state -> C = 1
    psi = np.array([1, 0, 0, 1]) / np.sqrt(2)
    rho = np.outer(psi, psi.conj())
    assert np.isclose(tools.concurrence(rho), 1.0)
    # product state -> C = 0
    psi = np.array([1, 0, 0, 0])
    rho = np.outer(psi, psi.conj())
    assert np.isclose(tools.concurrence(rho), 0.0)
    # werner state C = max(0, (3p-1)/2)
    p = 0.8
    bell = np.outer([1, 0, 0, 1], [1, 0, 0, 1]) / 2
    rho = p * bell + (1 - p) * np.eye(4) / 4
    assert np.isclose(tools.concurrence(rho), (3 * p - 1) / 2, atol=1e-10)


def test_superop_conventions():
    rng = np.random.default_rng(1)
    d = 3
    A = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    B = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    rho = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    v = superop.vec(rho)
    assert np.allclose(superop.unvec(superop.left_mult(A) @ v, d), A @ rho)
    assert np.allclose(superop.unvec(superop.right_mult(B) @ v, d), rho @ B)
    assert np.allclose(superop.unvec(superop.sandwich(A) @ v, d), A @ rho @ A.conj().T)
    assert np.allclose(superop.unvec(superop.commutator(A) @ v, d), A @ rho - rho @ A)
    assert np.isclose(superop.trace_vector(A) @ v, np.trace(A @ rho))


def test_dissipator_trace_preserving():
    rng = np.random.default_rng(2)
    d = 3
    L = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    D = superop.dissipator(L, rate=0.37)
    # Tr(D[rho]) = 0 for any rho: trace vector of identity annihilates D
    w = superop.trace_vector(np.eye(d))
    assert np.allclose(w @ D, 0, atol=1e-12)


def test_serialize_roundtrip():
    rng = np.random.default_rng(3)
    rho = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    assert np.allclose(tools.deserialize_dm(tools.serialize_dm(rho)), rho)


def test_tl_map_propagation():
    # propagate a qubit decay map and compare to closed form
    d = 2
    gamma = 0.1
    dt = 0.05
    L = np.array([[0, 1], [0, 0]], dtype=complex)
    Lsop = superop.dissipator(L, gamma)
    import scipy.linalg
    tl_map = scipy.linalg.expm(Lsop * dt)
    rho0 = np.array([[0, 0], [0, 1]], dtype=complex)
    times = np.arange(0, 200) * dt
    rho_t = tools.use_tl_map(tl_map, times, rho0)
    expected = np.exp(-gamma * times)
    assert np.allclose(rho_t[:, 1, 1].real, expected, atol=1e-10)


def test_units_roundtrip():
    assert np.isclose(tools.mev_to_nm(tools.nm_to_mev(920.0)), 920.0)
    assert np.isclose(tools.mev_to_ghz(tools.ghz_to_mev(5.0)), 5.0)


def test_get_union():
    x1 = np.array([0.0, 1.0, 2.0])
    x2 = np.array([1.0, 3.0])
    z1 = np.array([10.0, 11.0, 12.0])
    z2 = np.array([11.0, 13.0])
    x, z = tools.get_union(x1, x2, z1, z2)
    assert np.allclose(x, [0, 1, 2, 3])
    assert np.allclose(z[:, 0], [10, 11, 12, 13])
