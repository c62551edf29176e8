"""Detection metrics and anchor clustering tests."""

import numpy as np
import pytest

from bayesian_yolov3_tpu.eval import (
    average_precision,
    evaluate_detections,
    log_average_miss_rate,
)
from bayesian_yolov3_tpu.data import prior_clustering as pc


def _gt():
    return {
        "img0": np.asarray([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]]),
        "img1": np.asarray([[0.2, 0.2, 0.4, 0.5]]),
    }


def test_perfect_detections_give_ap_1():
    gt = _gt()
    preds = {k: (v, np.linspace(0.9, 0.8, len(v))) for k, v in gt.items()}
    assert average_precision(preds, gt) == pytest.approx(1.0)
    assert log_average_miss_rate(preds, gt) == pytest.approx(0.0, abs=1e-9)


def test_missed_gt_lowers_ap_and_raises_lamr():
    gt = _gt()
    preds = {
        "img0": (np.asarray([[0.1, 0.1, 0.3, 0.3]]), np.asarray([0.9])),
        "img1": (np.zeros((0, 4)), np.zeros(0)),
    }
    ap = average_precision(preds, gt)
    assert ap == pytest.approx(1.0 / 3.0, abs=1e-6)  # 1 of 3 GT recalled
    lamr = log_average_miss_rate(preds, gt)
    assert 0.5 < lamr <= 1.0


def test_false_positives_penalize_precision_not_recall():
    gt = _gt()
    preds = {
        "img0": (
            np.asarray([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8],
                        [0.0, 0.6, 0.1, 0.9]]),
            np.asarray([0.9, 0.85, 0.95]),  # highest-scored box is a FP
        ),
        "img1": (np.asarray([[0.2, 0.2, 0.4, 0.5]]), np.asarray([0.7])),
    }
    ap = average_precision(preds, gt)
    assert 0.6 < ap < 1.0


def test_duplicate_detection_is_false_positive():
    gt = {"img0": np.asarray([[0.1, 0.1, 0.3, 0.3]])}
    preds = {"img0": (np.asarray([[0.1, 0.1, 0.3, 0.3],
                                  [0.11, 0.11, 0.3, 0.3]]),
                      np.asarray([0.9, 0.8]))}
    ap = average_precision(preds, gt)
    assert ap == pytest.approx(1.0)  # best match is TP, dup is FP after recall 1


def test_evaluate_detections_per_class():
    gt = {
        "img0": (np.asarray([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]]),
                 np.asarray([0, 1])),
    }
    preds = {
        "img0": (np.asarray([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]]),
                 np.asarray([0.9, 0.9]), np.asarray([0, 1])),
    }
    out = evaluate_detections(preds, gt, cls_ids=[0, 1])
    assert out["mAP"] == pytest.approx(1.0)
    assert out["per_class"][0]["ap"] == pytest.approx(1.0)


def test_kmeans_recovers_synthetic_clusters(rng):
    true = np.asarray([[0.6, 0.2], [0.3, 0.1], [0.1, 0.03]])
    boxes = np.concatenate(
        [t * rng.uniform(0.9, 1.1, (200, 2)) for t in true]
    )
    centers = pc.kmeans_iou(boxes, k=3, seed=1)
    # sorted by area desc, each within 15% of a true cluster
    np.testing.assert_allclose(centers, true, rtol=0.15)
    assert pc.mean_best_iou(boxes, centers) > 0.8


def test_cluster_priors_structure(rng):
    boxes_px = rng.uniform(20, 400, (300, 2))
    priors = pc.cluster_priors(boxes_px, (1024, 2048), k=9, seed=0)
    assert set(priors) == {32, 16, 8}
    areas = [p.h * p.w for stride in (32, 16, 8) for p in priors[stride]]
    assert areas == sorted(areas, reverse=True)
    assert all(0 < p.h < 1 and 0 < p.w < 1 for ps in priors.values() for p in ps)
