"""Post-training int8 quantization of the detection-head section.

TPU framework extension (no reference counterpart — the TF1 reference
runs f32 only): the MXU executes int8 x int8 -> int32 at ~2x the bf16
rate, and the T-sample MC-dropout head section is the MXU-bound majority
of epistemic inference (BENCH_NOTES.md round-4: bf16 heads 41.5 ms vs
int8 26.1 ms at ECP/T=30 on a v5e).  This module implements the standard
serving recipe:

* **weights**: per-output-channel symmetric int8.  The incoming
  activation scale is folded INTO the float weight before quantizing
  (``w_folded[..., ci, co] = w[..., ci, co] * s_in[ci]``), which makes
  per-input-channel activation scales free — in particular the two scale
  regions of the upsample+skip concat (reference route layers,
  lib_yolo/yolov3.py:571-585) quantize exactly, with no runtime rescale.
* **activations**: per-tensor symmetric int8, scales calibrated from the
  observed per-site absolute maxima of a few representative images run
  through the f32/bf16 path (``calibrate_mc_amax``).
* **epilogue**: numerically the production block (ops.common.conv_block)
  with the conv swapped for its int8 twin — dequant (per-channel) ->
  dropout (same ``hash_keep`` mask function, bit-identical masks for the
  same keys) -> BN affine -> LeakyReLU, all in f32, then requantize.
  XLA fuses the whole epilogue into the conv, exactly as in bf16 mode.

Only the head section quantizes: the early backbone is HBM-bound (int8
measured at parity there — BENCH_NOTES.md), runs once per image rather
than T times, and keeping it bf16 bounds the quantization error.

Error model: per-channel int8 weight quantization plus calibrated
activation quantization loses ~1% relative activation accuracy per
layer; detection-level agreement with the f32 path is asserted in
tests/test_quant.py and the mAP delta is measured on the synthetic
trained model (see PARITY.md "quantized inference").
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import _bn_affine, dropout, leaky_relu

_DN = ("NHWC", "HWIO", "NHWC")
_QMAX = 127.0


def quantize_weight_per_channel(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 (k, k, cin, cout) -> (int8 weights, f32 (cout,) dequant scales).

    Symmetric per-output-channel: s[co] = amax(|w[..., co]|) / 127.
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    wq = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, scale


def quantize_act(x, inv_scale):
    """f32/bf16 activations -> int8 at the calibrated per-tensor scale."""
    y = x.astype(jnp.float32) * inv_scale
    return jnp.clip(jnp.round(y), -_QMAX, _QMAX).astype(jnp.int8)


def conv2d_int8(x_q, w_q, *, stride: int = 1):
    """int8 x int8 -> int32 conv (SAME padding; the head section has no
    stride-2 convs — strides live in the bf16 backbone)."""
    assert stride == 1
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )


def quant_block(qp: Dict, x_q, *, drop_rate=None, rng=None, drop_key_u32=None):
    """int8 twin of ops.common.conv_block (conv -> dropout -> BN -> leaky).

    ``qp``: {"wq" int8, "dq" (cout,), "bns"/"bnb" folded BN affine,
    "inv_out" requant scale}.  Epilogue ordering and the dropout mask
    function are bit-compatible with the f32 block; only the conv operands
    are quantized.
    """
    acc = conv2d_int8(x_q, qp["wq"])
    y = acc.astype(jnp.float32) * qp["dq"]
    if drop_rate is not None and drop_rate > 0.0:
        y = dropout(y, drop_rate, rng, key_u32=drop_key_u32)
    y = y * qp["bns"] + qp["bnb"]
    y = leaky_relu(y)
    return quantize_act(y, qp["inv_out"])


def quant_detection_cf(qp: Dict, feats_q, n_mid_axes: int = 3):
    """int8 twin of ops.common.detection_conv_cf.

    feats_q: (T, ..., cin) int8 -> (ch, T, prod(...)) f32 — one int8 MXU
    contraction with the detection channels on the leading (minor-most
    downstream) axis, the fused epistemic decoder's native layout.
    """
    t, *mid, cin = feats_q.shape
    x = feats_q.reshape(t, int(np.prod(mid)), cin)
    acc = jax.lax.dot_general(
        qp["wq"], x, dimension_numbers=(((0,), (2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (ch, T, hw)
    return acc.astype(jnp.float32) * qp["dq"][:, None, None] + qp["b"][:, None, None]


def quantize_heads(params: Dict, stats: Dict, spec, amax: Dict[str, float]) -> Dict:
    """Build the quantized-head pytree from f32 params + calibration amax.

    ``amax``: per-site absolute maxima from ``calibrate_mc_amax`` — keys
    "out32"/"skip16"/"skip8" (backbone outputs = head entry points) and
    one per head/transition conv block name (post-LeakyReLU output = the
    next conv's input).

    Returns a pytree of arrays (safe to pass through jit): per conv block
    {"wq","dq","bns","bnb","inv_out"}, per detection conv {"wq","dq","b"},
    plus {"entry": {"out32","skip16","skip8"} inverse entry scales}.
    """
    from ..models.yolov3 import _BRANCH_IDX, _HEAD_PLANS, _TRANS_PLANS

    def s_of(name):
        return max(float(amax[name]), 1e-12) / _QMAX

    qh = {"entry": {
        k: jnp.float32(1.0 / s_of(k)) for k in ("out32", "skip16", "skip8")
    }}

    skip_scales = {2: s_of("skip16"), 3: s_of("skip8")}
    in_scale_vec = np.full((1024,), s_of("out32"), np.float32)
    for head in (1, 2, 3):
        if head > 1:
            tname = f"trans{head - 1}"
            branch_c = _HEAD_PLANS[head - 1][_BRANCH_IDX][1]
            qh[tname] = _quant_one(
                params[tname], stats[tname],
                np.full((branch_c,), prev_branch_scale, np.float32),
                s_of(tname),
            )
            skip_c = {2: 512, 3: 256}[head]
            in_scale_vec = np.concatenate([
                np.full((_TRANS_PLANS[head - 1][1],), s_of(tname), np.float32),
                np.full((skip_c,), skip_scales[head], np.float32),
            ])
        for j, (_, cout) in enumerate(_HEAD_PLANS[head]):
            name = f"head{head}_conv{j}"
            qh[name] = _quant_one(
                params[name], stats[name], in_scale_vec, s_of(name)
            )
            in_scale_vec = np.full((cout,), s_of(name), np.float32)
            if j == _BRANCH_IDX:
                prev_branch_scale = s_of(name)
        det = params[f"det{head}"]
        w_fold = np.asarray(det["w"], np.float32)[0, 0] * in_scale_vec[:, None]
        wq, dq = quantize_weight_per_channel(jnp.asarray(w_fold))
        qh[f"det{head}"] = {
            "wq": wq, "dq": dq, "b": jnp.asarray(det["b"], jnp.float32)
        }
    return qh


def _quant_one(p: Dict, s: Dict, in_scale_vec, out_scale: float) -> Dict:
    w_fold = jnp.asarray(p["w"], jnp.float32) * jnp.asarray(
        in_scale_vec, jnp.float32)[None, None, :, None]
    wq, dq = quantize_weight_per_channel(w_fold)
    bns, bnb = _bn_affine(p["gamma"], p["beta"], s["mean"], s["var"])
    return {
        "wq": wq, "dq": dq,
        "bns": jnp.asarray(bns, jnp.float32), "bnb": jnp.asarray(bnb, jnp.float32),
        "inv_out": jnp.float32(1.0 / out_scale),
    }


def _site_reduce(x, percentile):
    """|x| -> calibration scalar: max-abs, or the given percentile of |x|
    (e.g. 99.9 — clips outlier activations for a finer int8 grid on the
    bulk; the clipped tail saturates at +-127, see calibrate docstrings)."""
    a = jnp.abs(x.astype(jnp.float32))
    if percentile is None:
        return jnp.max(a)
    return jnp.percentile(a.ravel(), percentile)


def calibrate_forward_amax(
    params: Dict, stats: Dict, images, *, spec, rng=None,
    compute_dtype=jnp.float32, standard_test_dropout: bool = False,
    fused_early=None, percentile=None,
) -> Dict[str, float]:
    """Per-site |activation| maxima for the BATCHED (non-MC) forwards.

    The standard/aleatoric counterpart of ``calibrate_mc_amax`` — one
    production forward per calibration image (dropout per spec: active
    only for the bayesian variant without standard_test_dropout), same
    capture sites (three backbone outputs + every head/trans conv block's
    post-LeakyReLU output).  ``images``: (N, H, W, 3) f32 in [0, 1].

    ``percentile`` (None or e.g. 99.9): reduce each site to that
    percentile of |activation| instead of the max — activations beyond it
    saturate at +-127 while the bulk gets a finer grid (the measured
    trade-off is recorded in tests/test_quant.py's calibration ablation).
    """
    from ..models import darknet
    from ..models.yolov3 import _heads

    dropout_active = spec.mc_dropout and not standard_test_dropout
    if dropout_active:
        assert rng is not None, "MC dropout requires an rng key"

    @jax.jit
    def one_image(img, key):
        out32, skip16, skip8, _ = darknet.darknet53(
            params["backbone"], stats["backbone"], img,
            training=False, compute_dtype=compute_dtype,
            fused_early=fused_early,
        )
        cap = {}
        _heads(
            params, stats, out32, skip16, skip8,
            spec=spec, training=False, dropout_active=dropout_active,
            rng=key, compute_dtype=compute_dtype, return_features=True,
            capture=cap,
        )
        out = {n: _site_reduce(v, percentile) for n, v in cap.items()}
        out["out32"] = _site_reduce(out32, percentile)
        out["skip16"] = _site_reduce(skip16, percentile)
        out["skip8"] = _site_reduce(skip8, percentile)
        return out

    amax: Dict[str, float] = {}
    key = None
    for i in range(images.shape[0]):
        if dropout_active:
            rng, key = jax.random.split(rng)
        vals = jax.device_get(one_image(images[i:i + 1], key))
        for n, v in vals.items():
            amax[n] = max(amax.get(n, 0.0), float(v))
    return amax


def calibrate_mc_amax(
    params: Dict, stats: Dict, images, *, spec, T: int, rng,
    compute_dtype=jnp.float32, fused_early=None, percentile=None,
) -> Dict[str, float]:
    """Observe per-site |activation| maxima over calibration images.

    Runs the production bf16/f32 MC path (dropout ACTIVE — the masks'
    1/keep inflation is part of the distribution being quantized) on each
    image and reduces each head/trans block's post-LeakyReLU output and
    the three backbone outputs to scalar maxima.  ``images``: (N, H, W, 3)
    f32 in [0, 1] (N small — 1-4 images suffice for max calibration).

    ``percentile`` (None or e.g. 99.9): per-sample percentile of
    |activation| instead of the max, then max over samples/images (see
    calibrate_forward_amax; the ablation lives in tests/test_quant.py).
    """
    from ..models import darknet
    from ..models.yolov3 import _heads

    @jax.jit
    def one_image(img, key):
        out32, skip16, skip8, _ = darknet.darknet53(
            params["backbone"], stats["backbone"], img,
            training=False, compute_dtype=compute_dtype,
            fused_early=fused_early,
        )
        entry = {
            "out32": _site_reduce(out32, percentile),
            "skip16": _site_reduce(skip16, percentile),
            "skip8": _site_reduce(skip8, percentile),
        }

        def one_sample(k):
            cap = {}
            _heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True, rng=k,
                compute_dtype=compute_dtype, return_features=True,
                capture=cap,
            )
            return {n: _site_reduce(v, percentile) for n, v in cap.items()}

        per_sample = jax.vmap(one_sample)(jax.random.split(key, T))
        out = {n: jnp.max(v) for n, v in per_sample.items()}
        out.update(entry)
        return out

    amax: Dict[str, float] = {}
    for i in range(images.shape[0]):
        rng, key = jax.random.split(rng)
        vals = jax.device_get(one_image(images[i:i + 1], key))
        for n, v in vals.items():
            amax[n] = max(amax.get(n, 0.0), float(v))
    return amax
