"""Per-anchor uncertainty heatmaps (parity with vis_uncertainty.py).

For each of the 9 priors and each uncertainty key —
``{epi_covar_loc, ale_var_loc} x {x, y, w, h}`` plus ``cls_mutual_info``,
``obj_mean``, ``obj_mutual_info`` — colorize the detection grid (plasma
colormap, 99th-percentile vmax, vis_uncertainty.py:15-31), nearest-upsample
by the stride, alpha-blend ``0.7*img + 0.3*heatmap`` and save a PNG
(:34-46; the reference's main flow calls ``color_map(..., vmin=0,
vmax=None)`` at :91-131, so vmin is 0 and vmax falls back to the
99th percentile).

The reference forks one process per key to get a fresh TF graph
(:192-202); with pure functions we simply run the epistemic forward once
and derive every heatmap from the same statistics.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.yolov3 import YoloV3
from ..ops import decode

log = logging.getLogger("byolo.vis")

LOC_KEYS = ["x", "y", "w", "h"]
ALPHA = 0.7  # blend factor (vis_uncertainty.py:44)


def uncertainty_maps(stats_per_scale: List[Dict]) -> Dict[str, List[np.ndarray]]:
    """Extract per-scale (h, w, B) maps for every visualization key."""
    out: Dict[str, List[np.ndarray]] = {}
    for i, key in enumerate(LOC_KEYS):
        out[f"epi_covar_loc_{key}"] = [
            np.asarray(s["epi_covar_loc"][..., i, i]) for s in stats_per_scale
        ]
        out[f"ale_var_loc_{key}"] = [
            np.asarray(s["ale_var_loc"][..., i]) for s in stats_per_scale
        ]
    for key in ("cls_mutual_info", "obj_mean", "obj_mutual_info"):
        out[key] = [np.asarray(s[key]) for s in stats_per_scale]
    return out


def colorize(grid: np.ndarray, vmin: Optional[float] = None,
             vmax: Optional[float] = None) -> np.ndarray:
    """(h, w) -> plasma RGB in [0,1] (vis_uncertainty.py:15-31).

    Defaults mirror the reference's colorize: vmin = grid minimum, vmax =
    99th percentile; norm = (grid - vmin) / (vmax - vmin), clipped to
    [0, 1] (the reference clips the 0-255 quantized indices, :24).  The
    production render flow passes vmin=0 (reference :91-131).
    """
    import matplotlib.cm as cm

    if vmin is None:
        vmin = float(np.min(grid))
    if vmax is None:
        vmax = np.percentile(grid, 99)
    span = max(float(vmax) - float(vmin), 1e-12)
    norm = np.clip((grid - float(vmin)) / span, 0.0, 1.0)
    return np.asarray(cm.plasma(norm))[..., :3]


def upsample_to(img_hw, grid: np.ndarray) -> np.ndarray:
    """Nearest-upsample a (h, w, 3) grid to the image size (stride blocks)."""
    reps_y = img_hw[0] // grid.shape[0]
    reps_x = img_hw[1] // grid.shape[1]
    return np.repeat(np.repeat(grid, reps_y, axis=0), reps_x, axis=1)


def blend(img: np.ndarray, heat: np.ndarray, alpha: float = ALPHA) -> np.ndarray:
    """``alpha*img + (1-alpha)*heat`` — 70% image, 30% heatmap
    (vis_uncertainty.py:40, ``blended = alpha * img + (1 - alpha) *
    uncertainty`` with alpha=0.7)."""
    return np.clip(alpha * img + (1 - alpha) * heat, 0.0, 1.0)


class UncertaintyVisualizer:
    """vis_uncertainty.py main flow: epistemic forward -> heatmap PNGs."""

    def __init__(self, config: Config, params, stats, seed: int = 0):
        assert config.model == "bayesian"
        self.config = config
        self.model = YoloV3.from_config(config)
        self.params, self.stats = params, stats
        self.rng = jax.random.PRNGKey(seed)

        def epistemic_stats(params, stats, img, key):
            raws = self.model.mc_forward(params, stats, img, T=config.T, rng=key)
            return [
                decode.decode_epistemic_stats(
                    decode.split_detection(raw, self.model.spec)
                )
                for raw in raws
            ]

        self._jit = jax.jit(epistemic_stats)

    def render(self, img: np.ndarray, out_dir: str, tag: str = "img") -> List[str]:
        """img: (h, w, 3) float [0,1].  Writes one PNG per (key, prior)."""
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        scale_stats = self._jit(
            self.params, self.stats, jnp.asarray(img[None], jnp.float32), self.rng
        )
        maps = uncertainty_maps(scale_stats)
        written = []
        for key, per_scale in maps.items():
            for scale_idx, grid in enumerate(per_scale):
                for prior_idx in range(grid.shape[-1]):
                    # reference main flow: vmin=0 explicit, vmax 99th pct
                    heat = colorize(grid[..., prior_idx], vmin=0.0)
                    heat = upsample_to(img.shape[:2], heat)
                    blended = blend(img, heat)
                    name = f"{tag}_{key}_l{scale_idx}_p{prior_idx}.png"
                    path = os.path.join(out_dir, name)
                    Image.fromarray((blended * 255).astype(np.uint8)).save(path)
                    written.append(path)
        log.info("wrote %d heatmaps to %s", len(written), out_dir)
        return written
