"""Golden tests: RRC designer vs the reference C tap tables
(reference: src/constants.c:49-99 alpha50_root, 106-156 alpha35_root)."""

import numpy as np

from singlecarrier_tpu.constants import ALPHA35_ROOT, ALPHA50_ROOT
from singlecarrier_tpu.filter_design import gen_rn_coeffs, reference_taps

# The C tables, transcribed digit-for-digit (src/constants.c:49-156).
C_ALPHA50 = np.array([
    0.002040776, 0.001733205, -0.000094696, -0.002190566, -0.002803057,
    -0.001145122, 0.001875377, 0.004037490, 0.003421695, 0.000028693,
    -0.003768086, -0.004657093, -0.000932888, 0.005513738, 0.009520251,
    0.005665029, -0.007427566, -0.024194919, -0.032975574, -0.021014393,
    0.018508466, 0.081140162, 0.150832112, 0.205501104, 0.226202985,
    0.205501104, 0.150832112, 0.081140162, 0.018508466, -0.021014393,
    -0.032975574, -0.024194919, -0.007427566, 0.005665029, 0.009520251,
    0.005513738, -0.000932888, -0.004657093, -0.003768086, 0.000028693,
    0.003421695, 0.004037490, 0.001875377, -0.001145122, -0.002803057,
    -0.002190566, -0.000094696, 0.001733205, 0.002040776])

C_ALPHA35 = np.array([
    -0.00024537, -0.00220636, -0.00291493, -0.00175708, 0.00068764,
    0.00282391, 0.00297883, 0.00059170, -0.00311265, -0.00553670,
    -0.00418297, 0.00153693, 0.00925400, 0.01422443, 0.01161151,
    -0.00045943, -0.01864749, -0.03439334, -0.03667604, -0.01667595,
    0.02761997, 0.08908617, 0.15279058, 0.20079911, 0.21864582,
    0.20079911, 0.15279058, 0.08908617, 0.02761997, -0.01667595,
    -0.03667604, -0.03439334, -0.01864749, -0.00045943, 0.01161151,
    0.01422443, 0.00925400, 0.00153693, -0.00418297, -0.00553670,
    -0.00311265, 0.00059170, 0.00297883, 0.00282391, 0.00068764,
    -0.00175708, -0.00291493, -0.00220636, -0.00024537])


def test_alpha50_matches_reference_table():
    taps = reference_taps(0.50)
    assert np.max(np.abs(taps - C_ALPHA50)) < 5e-9


def test_alpha35_matches_reference_table():
    taps = reference_taps(0.35)
    assert np.max(np.abs(taps - C_ALPHA35)) < 5e-9


def test_constants_module_tables():
    assert np.max(np.abs(ALPHA50_ROOT - C_ALPHA50.astype(np.float32))) < 1e-7
    assert np.max(np.abs(ALPHA35_ROOT - C_ALPHA35.astype(np.float32))) < 1e-7


def test_taps_symmetric():
    for alpha in (0.35, 0.5):
        t = reference_taps(alpha)
        assert np.allclose(t, t[::-1], atol=1e-12)


def test_full_output_is_50_taps():
    full = gen_rn_coeffs(0.35, 1 / 8000, 1600, 10, 5)
    assert full.shape == (50,)


def test_unit_dc_gain():
    # The root filter's DC gain (tap sum) is ~1: sqrt of the RC filter's
    # unit passband response.
    for alpha in (0.35, 0.5):
        t = reference_taps(alpha)
        assert abs(t.sum() - 1.0) < 0.01
