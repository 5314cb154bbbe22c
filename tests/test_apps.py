"""Application-layer tests: Rabi/TPE sweeps (batched + sharded), polarization
entanglement, against physics expectations."""

import numpy as np
import pytest

from pyaceqd_tpu.apps.rabi_rotations import RabiRotations
from pyaceqd_tpu.apps.tpe_rotations import TPERotations
from pyaceqd_tpu.models.biexciton import biexciton
from pyaceqd_tpu.parallel.mesh import default_mesh
from pyaceqd_tpu.pol_entanglement import PolarizatzionEntanglement
from pyaceqd_tpu.pulses import Pulse


def test_rabi_rotations_sweep(tmp_path):
    rr = RabiRotations(dt=0.05, tau=2, area_max=4, n_area=17, gamma_e=1 / 50,
                       phonons=False, temp_dir=str(tmp_path))
    areas, counts = rr.get_rabi_rotations(integrate=False, path=str(tmp_path) + "/")
    # final occupation = sin^2(area*pi/2) without decay
    expected = np.sin(areas * np.pi / 2) ** 2
    assert np.allclose(counts, expected, atol=1e-3)
    # CSV cache round trip
    areas2, counts2 = rr.get_rabi_rotations(integrate=False, path=str(tmp_path) + "/")
    # CSV cache truncates to 4 decimals (reference export_csv precision)
    assert np.allclose(counts2, counts, atol=1e-4)


def test_rabi_rotations_sharded(tmp_path):
    mesh = default_mesh()
    assert mesh.devices.size == 8  # conftest forces an 8-device CPU mesh
    rr = RabiRotations(dt=0.05, tau=2, area_max=4, n_area=18, gamma_e=1 / 50,
                       phonons=False, temp_dir=str(tmp_path))
    areas, counts = rr.get_rabi_rotations(integrate=False,
                                          path=str(tmp_path) + "/s_", mesh=mesh)
    expected = np.sin(areas * np.pi / 2) ** 2
    assert np.allclose(counts, expected, atol=1e-3)


def test_rabi_integrated_counts(tmp_path):
    # integrated counts ~ one photon per pi pulse
    rr = RabiRotations(dt=0.05, tau=1, area_max=1, n_area=2, gamma_e=1 / 20,
                       phonons=False, temp_dir=str(tmp_path))
    areas, counts = rr.get_rabi_rotations(integrate=True, path=str(tmp_path) + "/i_")
    assert counts[0] < 1e-8            # no pulse, no photon
    assert 0.9 < counts[1] < 1.05      # pi pulse: ~1 emitted photon


def test_tpe_rotations(tmp_path):
    tpe = TPERotations(dt=0.05, tau=4, delta_b=4, area_max=16, n_area=9,
                       gamma_e=1 / 50, phonons=False, temp_dir=str(tmp_path))
    areas, results = tpe.get_rabi_rotations(integrate=False,
                                            path=str(tmp_path) + "/")
    b = results[2]
    # TPE Rabi oscillation of the biexciton occupation: rises from 0
    assert b[0] < 1e-8
    assert np.max(b) > 0.5


def test_polarization_entanglement_concurrence(tmp_path):
    # pure biexciton cascade (start in |B>, no pulse, zero FSS): the photon
    # pair is exactly (|XX> + |YY>)/sqrt(2) -> concurrence 1
    opts = {"gamma_e": 1 / 20, "lindblad": True, "phonons": False,
            "delta_b": 4, "delta_xy": 0, "initial": "|3><3|_4",
            "temp_dir": str(tmp_path)}
    # x/y photons come from BOTH cascade transitions (B->X and X->G)
    pol = PolarizatzionEntanglement(
        biexciton, "|0><1|_4 + |1><3|_4", "|0><2|_4 + |2><3|_4",
        "|1><0|_4 + |3><1|_4", "|2><0|_4 + |3><2|_4", dt=0.2, tend=250,
        dt_small=1.0, regular_grid=True, options=opts)
    conc, dm = pol.calc_densitymatrix_reuse(return_rho=True)
    dmn = dm / np.trace(dm)
    assert np.isclose(dmn[0, 0].real, 0.5, atol=1e-3)
    assert np.isclose(dmn[3, 3].real, 0.5, atol=1e-3)
    assert np.isclose(abs(dmn[0, 3]), 0.5, atol=1e-3)
    assert conc > 0.999


def test_polarization_entanglement_fss_reduces_concurrence(tmp_path):
    # finite fine-structure splitting dephases the XX-YY coherence
    opts = {"gamma_e": 1 / 20, "lindblad": True, "phonons": False,
            "delta_b": 4, "delta_xy": 0.1, "initial": "|3><3|_4",
            "temp_dir": str(tmp_path)}
    pol = PolarizatzionEntanglement(
        biexciton, "|0><1|_4 + |1><3|_4", "|0><2|_4 + |2><3|_4",
        "|1><0|_4 + |3><1|_4", "|2><0|_4 + |3><2|_4", dt=0.2, tend=250,
        dt_small=1.0, regular_grid=True, options=opts)
    conc = pol.calc_densitymatrix_reuse()
    assert conc < 0.6
