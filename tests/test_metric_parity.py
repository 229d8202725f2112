"""Metric parity pins (round-1 verdict item #5).

NQM is A/B-tested against the reference implementation imported directly
from /root/reference/Utils/NQM.py as a pure-numpy oracle (the reference
drives it from metric_calculate, train_test_utils.py:789-806). FSIM and
VIF-p cannot be piq-verified in this environment (piq is not installed and
installs are disallowed), so they are pinned to frozen fixture values
computed from deterministic synthetic pairs — any implementation drift
breaks these pins even though absolute piq parity remains unvalidated.
"""

import importlib.util
import os

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from ipdm_tpu.metrics.fsim import fsim
from ipdm_tpu.metrics.nqm import nqm
from ipdm_tpu.metrics.vif import vif_p

REF_NQM = "/root/reference/Utils/NQM.py"


def _pairs(n, size=64):
    """Deterministic structured/noisy image pairs in [0, 1]."""
    rng = np.random.default_rng(42)
    out = []
    for i in range(n):
        base = rng.random((size, size))
        ref = gaussian_filter(base, 3.0 + i * 0.3)
        ref = (ref - ref.min()) / (ref.max() - ref.min() + 1e-12)
        noise = rng.normal(0, 0.02 + 0.02 * i, (size, size))
        q = np.clip(ref + noise, 0, 1)
        out.append((ref.astype(np.float64), q.astype(np.float64)))
    return out


@pytest.mark.skipif(not os.path.exists(REF_NQM),
                    reason="reference tree not present")
def test_nqm_matches_reference_oracle():
    """metrics.nqm must coincide with the reference NQM to 1e-6 on ≥10
    synthetic pairs — metric.json numbers depend on it."""
    spec = importlib.util.spec_from_file_location("ref_nqm_oracle", REF_NQM)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    checked = 0
    for ref, q in _pairs(10):
        want = float(ref_mod.NQM(ref, q))
        got = float(nqm(ref, q))
        assert got == pytest.approx(want, abs=1e-6), (got, want)
        checked += 1
    assert checked == 10


# Frozen fixtures: fsim/vif_p on _pairs(4) as of the pinned implementation.
# Regenerate ONLY on an intentional metric change (see module docstring).
_FSIM_PIN = [0.9730765069, 0.9253728873, 0.8356821367, 0.7844426645]
_VIF_PIN = [0.6244719609, 0.4521938236, 0.2911560092, 0.2570173942]


def test_fsim_pinned():
    for (ref, q), want in zip(_pairs(4), _FSIM_PIN):
        assert float(fsim(ref, q)) == pytest.approx(want, abs=1e-7)


def test_vif_pinned():
    for (ref, q), want in zip(_pairs(4), _VIF_PIN):
        assert float(vif_p(ref, q)) == pytest.approx(want, abs=1e-7)


def test_vif_identical_is_one():
    ref, _ = _pairs(1)[0]
    assert float(vif_p(ref, ref)) == pytest.approx(1.0, abs=1e-6)
