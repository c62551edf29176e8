"""Image-file detection demo (parity with the reference's detect.py).

Reads image files (not tfrecords), optionally center-crops, runs
forward + decode + NMS on device, filters by objectness threshold,
computes ``score = obj * max_cls`` and draws boxes.

Differences from the reference (detect.py:16-184): model dispatch is
config-driven instead of hand-edited tables; drawing uses cv2 when
available and falls back to a pure-numpy rectangle rasterizer; output is
written to files instead of a blocking matplotlib window (use
``show=True`` for the interactive behavior).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from .ecp import DEFAULT_CLS_NAMES
from .runner import InferenceRunner

log = logging.getLogger("byolo.detect")


def load_img(path: str) -> np.ndarray:
    """Image file -> (h, w, 3) float32 in [0, 1] (parity detect.py:76-85)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def center_crop(img: np.ndarray, crop_hw) -> np.ndarray:
    h, w = img.shape[:2]
    ch, cw = crop_hw[:2]
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return img[y0 : y0 + ch, x0 : x0 + cw]


def filter_and_score(rows: np.ndarray, valid: np.ndarray, spec, epistemic: bool,
                     thresh: float, img_hw) -> List[Dict]:
    """objectness threshold + score computation (parity detect.py:36-63)."""
    obj_idx = spec.obj_idx(epistemic)
    cls_start = spec.cls_start_idx(epistemic)
    out = []
    for i in np.flatnonzero(valid):
        row = rows[i]
        obj = float(row[obj_idx])
        if obj <= thresh:
            continue
        cls_scores = row[cls_start : cls_start + spec.cls_cnt]
        cls = int(np.argmax(cls_scores))
        out.append(
            {
                "y0": float(row[0]) * img_hw[0],
                "x0": float(row[1]) * img_hw[1],
                "y1": float(row[2]) * img_hw[0],
                "x1": float(row[3]) * img_hw[1],
                "score": obj * float(cls_scores[cls]),
                "cls": cls,
            }
        )
    return out


def draw_boxes(img: np.ndarray, boxes: Sequence[Dict], cls_names=None) -> np.ndarray:
    """Draw detection rectangles; green like the reference (detect.py:66-73)."""
    cls_names = cls_names or DEFAULT_CLS_NAMES
    out = (img * 255).astype(np.uint8).copy()
    try:
        import cv2

        for b in boxes:
            p0 = (int(b["x0"]), int(b["y0"]))
            p1 = (int(b["x1"]), int(b["y1"]))
            cv2.rectangle(out, p0, p1, (0, 255, 0), 2)
            cv2.putText(out, f"{b['score']:.2f}", (p0[0], max(p0[1] - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 255, 0), 1)
    except ImportError:
        h, w = out.shape[:2]
        for b in boxes:
            y0, x0 = max(int(b["y0"]), 0), max(int(b["x0"]), 0)
            y1, x1 = min(int(b["y1"]), h - 1), min(int(b["x1"]), w - 1)
            out[y0:y1 + 1, [x0, x1]] = (0, 255, 0)
            out[[y0, y1], x0:x1 + 1] = (0, 255, 0)
    return out


class Detector:
    """detect.py-style runner over a list of image files."""

    def __init__(self, config: Config, seed: int = 0):
        self.config = config
        self.runner = InferenceRunner(
            _uncropped(config), seed=seed
        )  # device pipeline is crop-agnostic; we crop on host like detect.py
        self.params, self.stats, self.step = self.runner.load_state()

    def detect_file(self, path: str) -> Dict:
        cfg = self.config
        img = load_img(path)
        if cfg.crop:
            img = center_crop(img, cfg.crop_img_size)
        images = (img[None] * 255).astype(np.uint8)
        key = jax.random.fold_in(jax.random.PRNGKey(1), hash(path) % (2**31))
        rows, valid = self.runner.predict(self.params, self.stats, images, key)
        boxes = filter_and_score(
            rows[0], valid[0], self.runner.spec,
            self.runner.epistemic, cfg.thresh, img.shape[:2],
        )
        return {"image": img, "boxes": boxes}

    def run(self, files: Sequence[str], out_dir: Optional[str] = None,
            show: bool = False) -> List[Dict]:
        results = []
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        for path in files:
            res = self.detect_file(path)
            drawn = draw_boxes(res["image"], res["boxes"])
            if out_dir:
                from PIL import Image

                name = os.path.splitext(os.path.basename(path))[0] + "_det.png"
                Image.fromarray(drawn).save(os.path.join(out_dir, name))
            if show:  # reference behavior: blocking matplotlib window
                import matplotlib.pyplot as plt

                plt.imshow(drawn)
                plt.show()
            log.info("%s: %d boxes over thresh %.2f", path, len(res["boxes"]),
                     self.config.thresh)
            results.append(res)
        return results


def _uncropped(config: Config) -> Config:
    """detect.py crops on the host then feeds the crop-sized image; the
    device pipeline therefore sees img_size = crop size with crop=False
    (priors already rescaled by Config.resolved_priors)."""
    import dataclasses as dc

    if not config.crop:
        return config
    priors = config.resolved_priors()
    return dc.replace(
        config, crop=False, full_img_size=tuple(config.crop_img_size), priors=priors
    )
