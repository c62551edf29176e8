"""Numpy golden-model oracles for the numeric core.

The reference keeps numpy reference implementations beside its TF graph code
as its de-facto test mechanism (SURVEY §4): GT encoding (lib_yolo/data.py)
and box decoding (lib_yolo/utils.py:72-123).  These oracles re-state those
semantics independently in numpy so the JAX implementations can be checked
against them.
"""

from __future__ import annotations

import numpy as np


def logistic(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / np.sum(e, axis=axis, keepdims=True)


def logistic_entropy(p):
    with np.errstate(divide="ignore", invalid="ignore"):
        out = -(np.where(p > 0, p * np.log(p), 0.0)
                + np.where(p < 1, (1 - p) * np.log(1 - p), 0.0))
    return out


def softmax_entropy(p):
    with np.errstate(divide="ignore", invalid="ignore"):
        return -np.sum(np.where(p > 0, p * np.log(p), 0.0), axis=-1)


def split_aleatoric(raw, cls_cnt):
    """raw (..., h, w, B*(2*(5+C))) -> dict of per-prior fields."""
    C = cls_cnt
    chpp = 2 * (5 + C)
    *lead, h, w, ch = raw.shape
    B = ch // chpp
    x = raw.reshape(*lead, h, w, B, chpp)
    return {
        "loc": x[..., 0:4],
        "log_loc_var": x[..., 4:8],
        "obj": x[..., 8],
        "log_obj_stddev": x[..., 9],
        "cls": x[..., 10 : 10 + C],
        "log_cls_stddev": x[..., 10 + C : 10 + 2 * C],
    }


def split_standard(raw, cls_cnt):
    C = cls_cnt
    chpp = 5 + C
    *lead, h, w, ch = raw.shape
    B = ch // chpp
    x = raw.reshape(*lead, h, w, B, chpp)
    return {"loc": x[..., 0:4], "obj": x[..., 4], "cls": x[..., 5 : 5 + C]}


def decode_corners(loc, priors_hw):
    """Scalar-loop box decode, mirroring utils.py:72-123 semantics."""
    *lead, h, w, B, _ = loc.shape
    out = np.zeros((*lead, h, w, B, 4), np.float64)
    it = np.ndindex(*lead) if lead else [()]
    for b in it:
        for row in range(h):
            for col in range(w):
                for p in range(B):
                    tx, ty, tw, th = loc[b + (row, col, p)] if lead else loc[row, col, p]
                    x = (col + logistic(tx)) / w
                    y = (row + logistic(ty)) / h
                    bw = np.exp(tw) * priors_hw[p, 1]
                    bh = np.exp(th) * priors_hw[p, 0]
                    idx = b + (row, col, p) if lead else (row, col, p)
                    out[idx] = [y - bh / 2, x - bw / 2, y + bh / 2, x + bw / 2]
    return out


def decode_standard(raw, cls_cnt, priors_hw):
    det = split_standard(np.asarray(raw, np.float64), cls_cnt)
    corners = decode_corners(det["loc"], priors_hw)
    obj = logistic(det["obj"])[..., None]
    cls = softmax(det["cls"])
    return np.concatenate([corners, obj, cls], axis=-1)


def decode_aleatoric(raw, cls_cnt, priors_hw, layer_id):
    det = split_aleatoric(np.asarray(raw, np.float64), cls_cnt)
    corners = decode_corners(det["loc"], priors_hw)
    loc_var = np.exp(det["log_loc_var"])
    total = np.prod(loc_var, axis=-1, keepdims=True)
    obj = logistic(det["obj"])
    cls = softmax(det["cls"])
    ones = np.ones_like(obj[..., None])
    B = ones.shape[-2]
    pid = np.broadcast_to(np.arange(B, dtype=np.float64)[:, None], ones.shape)
    return np.concatenate(
        [corners, loc_var, total, obj[..., None], logistic_entropy(obj)[..., None],
         cls, softmax_entropy(cls)[..., None], layer_id * ones, pid], axis=-1)


def epistemic_stats(raw_T, cls_cnt):
    """decode_epistemic oracle: reduce over leading T axis (layers.py:361-411)."""
    det = split_aleatoric(np.asarray(raw_T, np.float64), cls_cnt)
    loc = det["loc"]
    loc_var = np.exp(det["log_loc_var"])
    obj = logistic(det["obj"])
    cls = softmax(det["cls"])

    ev_loc = loc.mean(axis=0)
    ev_xxT = np.mean(loc[..., :, None] * loc[..., None, :], axis=0)
    epi_covar = ev_xxT - ev_loc[..., :, None] * ev_loc[..., None, :]

    obj_mean = obj.mean(axis=0)
    cls_mean = cls.mean(axis=0)
    return {
        "ev_loc": ev_loc,
        "epi_covar_loc": epi_covar,
        "ale_var_loc": loc_var.mean(axis=0),
        "obj_mean": obj_mean,
        "obj_entropy": logistic_entropy(obj_mean),
        "obj_mutual_info": logistic_entropy(obj_mean) - logistic_entropy(obj).mean(axis=0),
        "cls_mean": cls_mean,
        "cls_entropy": softmax_entropy(cls_mean),
        "cls_mutual_info": softmax_entropy(cls_mean) - softmax_entropy(cls).mean(axis=0),
    }


def greedy_nms(boxes, scores, max_out=1000, iou_thresh=0.5):
    """Sequential greedy NMS with TF semantics (suppress IoU > thresh)."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64).copy()
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(boxes), bool)
    out = []
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for i in order:
        if not alive[i]:
            continue
        out.append(i)
        if len(out) >= max_out:
            break
        y0 = np.maximum(boxes[:, 0], boxes[i, 0])
        x0 = np.maximum(boxes[:, 1], boxes[i, 1])
        y1 = np.minimum(boxes[:, 2], boxes[i, 2])
        x1 = np.minimum(boxes[:, 3], boxes[i, 3])
        inter = np.maximum(y1 - y0, 0) * np.maximum(x1 - x0, 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            iou = inter / (areas + areas[i] - inter)
        alive &= ~(iou > iou_thresh)
    return np.asarray(out, np.int32)
