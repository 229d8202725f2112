"""Metric parity pins (round-1 verdict item #5; piq parity round-2 #5).

NQM is A/B-tested against the reference implementation imported directly
from /root/reference/Utils/NQM.py as a pure-numpy oracle (the reference
drives it from metric_calculate, train_test_utils.py:789-806). FSIM and
VIF-p are A/B-tested against tests/piq_oracle.py — an independent torch
transliteration of piq's published algorithm (the package piq itself cannot
be installed here; the reference computes both metrics through it,
train_test_utils.py:20-21,802-804). Agreement of two independently written
implementations (numpy/MATLAB-structured vs torch/piq-structured) to 1e-5
is the strongest piq-parity evidence available without network access.
Frozen value pins on the same fixtures additionally catch silent drift in
BOTH implementations.
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


def _pair_512():
    """One 512² structured pair — exercises the F=2 average-pool path the
    Mayo 512² slices hit (the 64² pairs have F=1)."""
    rng = np.random.default_rng(7)
    base = gaussian_filter(rng.random((512, 512)), 8.0)
    ref = (base - base.min()) / (base.max() - base.min() + 1e-12)
    q = np.clip(ref + rng.normal(0, 0.03, ref.shape), 0, 1)
    return ref.astype(np.float64), q.astype(np.float64)


def test_fsim_matches_piq_oracle():
    from piq_oracle import piq_fsim
    for ref, q in _pairs(4):
        assert float(fsim(ref, q)) == pytest.approx(
            piq_fsim(ref, q), abs=1e-5)


@pytest.mark.slow
def test_fsim_matches_piq_oracle_512():
    from piq_oracle import piq_fsim
    ref, q = _pair_512()
    assert float(fsim(ref, q)) == pytest.approx(piq_fsim(ref, q), abs=1e-5)


def test_vif_matches_piq_oracle():
    from piq_oracle import piq_vif_p
    for ref, q in _pairs(4):
        assert float(vif_p(ref, q)) == pytest.approx(
            piq_vif_p(ref, q), abs=1e-5)


# Frozen fixtures: fsim/vif_p on _pairs(4) under the piq conventions
# (avg-pool downsample, zero-pad Scharr, lower median, EPS=1e-8).
# Regenerate ONLY on an intentional metric change (see module docstring).
_FSIM_PIN = [0.9767255421, 0.9315028455, 0.8543006397, 0.8018572045]
_VIF_PIN = [0.6244719607, 0.4521938235, 0.2911560091, 0.2570173942]


def test_fsim_pinned():
    for (ref, q), want in zip(_pairs(4), _FSIM_PIN):
        assert float(fsim(ref, q)) == pytest.approx(want, abs=1e-7)


def test_vif_pinned():
    for (ref, q), want in zip(_pairs(4), _VIF_PIN):
        assert float(vif_p(ref, q)) == pytest.approx(want, abs=1e-7)


def test_vif_identical_is_one():
    ref, _ = _pairs(1)[0]
    assert float(vif_p(ref, ref)) == pytest.approx(1.0, abs=1e-6)
