"""Tests for Dice/clDice evaluation metrics."""

import numpy as np
import pytest

from vangan_tpu.metrics import (
    binarise_prediction,
    cldice_metric,
    dice_coefficient,
    evaluate_segmentation,
)


def tube(shape=(24, 24, 24), axis_pos=(12, 12), half_width=2):
    v = np.zeros(shape, dtype=np.float32)
    a, b = axis_pos
    v[a - half_width : a + half_width, b - half_width : b + half_width, :] = 1.0
    return v


class TestMetrics:
    def test_dice_perfect(self):
        t = tube()
        assert dice_coefficient(t, t) == pytest.approx(1.0, abs=1e-3)

    def test_dice_disjoint(self):
        a = tube(axis_pos=(5, 5))
        b = tube(axis_pos=(18, 18))
        assert dice_coefficient(a, b) < 0.01

    def test_cldice_perfect(self):
        t = tube()
        assert cldice_metric(t, t, iters=5) == pytest.approx(1.0, abs=0.05)

    def test_cldice_penalises_broken_centerline(self):
        t = tube()
        broken = t.copy()
        broken[:, :, 8:16] = 0.0  # cut the vessel in the middle
        full = cldice_metric(t, t, iters=5)
        cut = cldice_metric(t, broken, iters=5)
        assert cut < full

    def test_binarise_prediction_midpoint(self):
        pred = np.array([0.0, 100.0, 255.0], dtype=np.float32)
        out = binarise_prediction(pred)
        np.testing.assert_array_equal(out, [0.0, 0.0, 1.0])

    def test_evaluate_segmentation_pm1_truth(self):
        t = tube()
        truth_pm1 = 2 * t - 1
        pred = 255.0 * t  # stitched-style prediction
        scores = evaluate_segmentation(pred, truth_pm1, iters=5)
        assert scores["dice"] == pytest.approx(1.0, abs=1e-3)
        assert scores["cldice"] == pytest.approx(1.0, abs=0.05)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            evaluate_segmentation(np.zeros((4, 4, 4)), np.zeros((5, 5, 5)))
