"""core/fastmath.py (kernel-safe inverse trig) accuracy pins vs numpy."""

import numpy as np

from dxk_tpu.core import fastmath as fm


def test_atan2_full_plane():
    rng = np.random.default_rng(0)
    y = rng.normal(size=20000).astype(np.float32) * 10
    x = rng.normal(size=20000).astype(np.float32) * 10
    got = np.asarray(fm.atan2(y, x))
    ref = np.arctan2(y, x)
    assert np.abs(got - ref).max() < 4e-7


def test_atan2_axes_and_corners():
    pts = [(1.0, 0.0, 0.0), (0.0, 1.0, np.pi / 2), (-1.0, 0.0, np.pi),
           (0.0, -1.0, -np.pi / 2), (1.0, 1.0, np.pi / 4), (0.0, 0.0, 0.0)]
    for x, y, want in pts:
        got = float(fm.atan2(np.float32(y), np.float32(x)))
        assert abs(got - want) < 4e-7, (x, y, got, want)


def test_acos_asin():
    x = np.linspace(-1.0, 1.0, 20001).astype(np.float32)
    assert np.abs(np.asarray(fm.acos(x)) - np.arccos(x)).max() < 1e-5
    assert np.abs(np.asarray(fm.asin(x)) - np.arcsin(x)).max() < 1e-5
    mid = x[np.abs(x) < 0.99]
    assert np.abs(np.asarray(fm.acos(mid)) - np.arccos(mid)).max() < 6e-7


def test_acos_clamps_out_of_range():
    assert float(fm.acos(np.float32(1.0001))) == 0.0
    assert abs(float(fm.acos(np.float32(-1.0001))) - np.pi) < 1e-6
