"""GT-encoder parity: vectorized JAX encoder vs a sequential numpy oracle
that mirrors the reference tf.while_loop semantics (tfdata.py:77-171)."""

import numpy as np
import pytest

from bayesian_yolov3_tpu.core.blueprint import ModelBlueprint
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS
from bayesian_yolov3_tpu.data import encode

IMG = (64, 96, 3)
BP = ModelBlueprint.build(IMG, ECP_9_PRIORS, cls_cnt=2)
TABLES = encode.build_prior_tables(BP)


def _logit(x):
    return -np.log(1.0 / x - 1.0)


def sequential_oracle(bboxes, labels, tables, ign_thresh=0.7):
    """Literal port of the reference while-loop semantics to numpy."""
    N = len(tables.cx)
    loc = np.zeros((N, 4), np.float64)
    obj = np.zeros(N, np.float64)
    cls = np.zeros(N, np.int32)
    ign = np.ones(N, np.float64)
    for i in range(len(bboxes)):
        y0, x0, y1, x1 = bboxes[i]
        w, h = x1 - x0, y1 - y0
        x, y = (x1 + x0) / 2, (y1 + y0) / 2
        dist_x = tables.lw * (x - tables.cx)
        dist_y = tables.lh * (y - tables.cy)
        cell = (dist_x >= 0) & (dist_x <= 1) & (dist_y >= 0) & (dist_y <= 1)
        iy0 = np.maximum(tables.bboxes[:, 0], y0)
        ix0 = np.maximum(tables.bboxes[:, 1], x0)
        iy1 = np.minimum(tables.bboxes[:, 2], y1)
        ix1 = np.minimum(tables.bboxes[:, 3], x1)
        inter = np.maximum(iy1 - iy0, 0) * np.maximum(ix1 - ix0, 0)
        iou = inter / (tables.areas - inter + h * w)
        mask = (iou >= iou.max()) & cell
        eps = 1e-7
        loc[mask, 0] = _logit(np.clip(dist_x[mask], eps, 1 - eps))
        loc[mask, 1] = _logit(np.clip(dist_y[mask], eps, 1 - eps))
        loc[mask, 2] = np.log(np.maximum(w / tables.pw[mask], eps))
        loc[mask, 3] = np.log(np.maximum(h / tables.ph[mask], eps))
        cls[mask] = labels[i]
        obj[mask] = 1.0
        ign[iou >= ign_thresh] = 0.0
    ign = np.maximum(ign, obj)
    return loc, obj, cls, ign


def _flatten(encoded):
    loc = np.concatenate([np.asarray(e["loc"]).reshape(-1, 4) for e in encoded])
    obj = np.concatenate([np.asarray(e["obj"]).reshape(-1) for e in encoded])
    cls = np.concatenate([np.asarray(e["cls"]).reshape(-1) for e in encoded])
    ign = np.concatenate([np.asarray(e["ign"]).reshape(-1) for e in encoded])
    return loc, obj, cls, ign


def _random_boxes(rng, n):
    yx = rng.uniform(0.05, 0.7, (n, 2))
    hw = rng.uniform(0.02, 0.35, (n, 2))
    return np.concatenate([yx, np.minimum(yx + hw, 0.999)], axis=1).astype(np.float32)


@pytest.mark.parametrize("n_boxes", [1, 5, 17])
def test_encoder_matches_sequential_oracle(rng, n_boxes):
    boxes = _random_boxes(rng, n_boxes)
    labels = rng.integers(0, 2, n_boxes).astype(np.int32)
    b, l, v = encode.pad_boxes(boxes, labels, max_boxes=24)
    got = encode.encode_boxes(b, l, v, TABLES, ign_thresh=0.7)
    gl, go, gc, gi = _flatten(got)
    wl, wo, wc, wi = sequential_oracle(boxes, labels, TABLES)
    np.testing.assert_array_equal(go, wo)
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_array_equal(gc * go.astype(np.int32), wc * wo.astype(np.int32))
    np.testing.assert_allclose(gl, wl, rtol=2e-4, atol=1e-4)
    assert go.sum() >= 1  # every box claims at least one anchor


def test_later_box_overwrites_earlier():
    # two identical boxes with different labels -> the later one wins
    box = np.array([[0.4, 0.4, 0.6, 0.5]], np.float32)
    boxes = np.concatenate([box, box])
    labels = np.array([0, 1], np.int32)
    b, l, v = encode.pad_boxes(boxes, labels, max_boxes=8)
    got = encode.encode_boxes(b, l, v, TABLES)
    _, go, gc, _ = _flatten(got)
    claimed = go > 0
    assert claimed.sum() >= 1
    assert np.all(gc[claimed] == 1)


def test_empty_gt_gives_all_background():
    b, l, v = encode.pad_boxes(np.zeros((0, 4), np.float32), np.zeros(0, np.int32), 8)
    got = encode.encode_boxes(b, l, v, TABLES)
    gl, go, gc, gi = _flatten(got)
    assert go.sum() == 0 and np.all(gi == 1) and np.all(gl == 0)


def test_prior_tables_shapes():
    assert TABLES.layer_shapes == ((2, 3, 3), (4, 6, 3), (8, 12, 3))
    assert sum(TABLES.layer_sizes) == BP.total_anchor_cnt == len(TABLES.cx)
    # first anchors belong to stride 32 (lw == 3 for IMG 64x96)
    assert TABLES.lw[0] == 3 and TABLES.lh[0] == 2
    assert TABLES.lw[-1] == 12 and TABLES.lh[-1] == 8


def test_encoded_targets_decode_back():
    """Round-trip: encode one box, decode the claimed anchor's targets back
    (parity with the reference's loc_to_boxes checker, data.py:284-313)."""
    boxes = np.array([[0.30, 0.40, 0.55, 0.52]], np.float32)
    labels = np.array([1], np.int32)
    b, l, v = encode.pad_boxes(boxes, labels, max_boxes=4)
    got = encode.encode_boxes(b, l, v, TABLES)
    gl, go, _, _ = _flatten(got)
    idx = np.flatnonzero(go)[0]

    def sigmoid(z):
        return 1 / (1 + np.exp(-z))

    x = sigmoid(gl[idx, 0]) / TABLES.lw[idx] + TABLES.cx[idx]
    y = sigmoid(gl[idx, 1]) / TABLES.lh[idx] + TABLES.cy[idx]
    w = np.exp(gl[idx, 2]) * TABLES.pw[idx]
    h = np.exp(gl[idx, 3]) * TABLES.ph[idx]
    np.testing.assert_allclose(x, 0.46, atol=1e-4)
    np.testing.assert_allclose(y, 0.425, atol=1e-4)
    np.testing.assert_allclose(w, 0.12, atol=1e-4)
    np.testing.assert_allclose(h, 0.25, atol=1e-4)
