"""Unit tests for the suppression-study regression checker (pure host logic).

The study itself (tools/suppression_study.py) drives the real eval loop and
is exercised on-chip; the monotonicity checker that turns it from a one-off
into a regression gate is plain arithmetic and is pinned here.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.suppression_study import check_monotone


def _rows(values):
    """values: {(markers, length): mpjpe}; (0, 0.0) is the clean baseline."""
    return [{"suppression_markers": m, "suppression_length": l, "MPJPE [mm]": v}
            for (m, l), v in values.items()]


def test_monotone_grid_passes():
    rows = _rows({(0, 0.0): 50.0, (1, 0.25): 55.0, (1, 0.5): 60.0,
                  (2, 0.25): 58.0, (2, 0.5): 70.0})
    assert check_monotone(rows) == []


def test_small_noise_within_tolerance_passes():
    # 1.5 mm BETTER than baseline at a positive length: inside the 2 mm
    # eval-noise tolerance, must not flag.
    rows = _rows({(0, 0.0): 50.0, (1, 0.25): 48.6, (1, 0.5): 52.0})
    assert check_monotone(rows) == []


def test_length_violation_flags():
    rows = _rows({(0, 0.0): 50.0, (1, 0.25): 55.0, (1, 0.5): 40.0})
    v = check_monotone(rows)
    assert len(v) == 1 and "markers=1" in v[0]


def test_marker_count_violation_flags():
    # At the same length, dropping MORE markers must not help.
    rows = _rows({(0, 0.0): 50.0, (1, 0.5): 60.0, (2, 0.5): 59.5,  # inside tol
                  (1, 0.25): 55.0, (2, 0.25): 52.5})               # outside tol
    v = check_monotone(rows)
    assert len(v) == 1 and "length=0.25" in v[0]
