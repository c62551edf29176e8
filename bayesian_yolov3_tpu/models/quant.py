"""Quantized (int8) head-section forwards.

Two int8 twins sharing one quantized-head pytree (ops.quant):

* ``mc_forward_cf_q`` — the T-sample epistemic forward
  (yolov3.mc_forward_cf);
* ``forward_cf_q`` — the batched standard/aleatoric inference forward
  (yolov3.forward_cf; the reference's headline batch-11 config,
  inference_aleatoric.py:227).

Both: same topology tables
(_HEAD_PLANS/_TRANS_PLANS/_BRANCH_IDX — single source of truth), same
vmap-over-T structure, same dropout key discipline (fresh per-(sample,
site) keys, or the fixed-MC-masks constant key table), same channels-first
detection output contract feeding ops.pallas_epistemic — only the conv
operands are int8 (see ops.quant for the quantization scheme and the
measured 1.6x head-section win that motivates it).

The backbone stays bf16 (runs once, HBM-bound — int8 measured at parity
there); its three outputs quantize at the calibrated entry scales.

No reference counterpart (the TF1 reference is f32-only); framework
extension, opt-in via ``Config.quantize = "int8"``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.blueprint import Variant, VariantSpec
from ..ops.quant import quant_block, quant_detection_cf, quantize_act
from . import darknet
from .yolov3 import _BRANCH_IDX, _fixed_key_table, DROP_PROB


def _heads_q(qh: Dict, q32, qs16, qs8, *, rng=None, fixed_site_keys=None,
             dropout_active: bool = True):
    """int8 head section: [int8 feats per head] (pre-detection-conv).

    Mirrors yolov3._heads with return_features=True; dropout (p=0.1) on
    convs 0..4 of each head, none on transitions or the final conv
    (parity lib_yolo/yolov3.py:543-622).  ``dropout_active=False`` runs
    the deterministic section (standard/aleatoric variants, or bayesian
    with standard_test_dropout) — no keys required.
    """
    if dropout_active and fixed_site_keys is None:
        assert rng is not None, "MC dropout requires an rng key"
        site_keys = jax.random.split(rng, 15)
    site = 0

    def run_block(name, x, drop):
        nonlocal site
        drop_rate = key = key32 = None
        if drop and dropout_active:
            drop_rate = DROP_PROB
            if fixed_site_keys is not None:
                key32 = fixed_site_keys[site]
            else:
                key = site_keys[site]
            site += 1
        return quant_block(
            qh[name], x, drop_rate=drop_rate, rng=key, drop_key_u32=key32
        )

    from ..ops.common import upsample2x

    feats = []
    x = q32
    for head, skip in ((1, None), (2, qs16), (3, qs8)):
        if skip is not None:
            x = run_block(f"trans{head - 1}", x, drop=False)
            x = upsample2x(x)
            x = jnp.concatenate([x, skip], axis=-1)
        branch = None
        for j in range(6):
            x = run_block(f"head{head}_conv{j}", x, drop=j <= _BRANCH_IDX)
            if j == _BRANCH_IDX:
                branch = x
        feats.append(x)
        x = branch
    return feats


def forward_cf_q(
    qh: Dict,
    params: Dict,
    stats: Dict,
    imgs,
    *,
    spec: VariantSpec,
    rng=None,
    standard_test_dropout: bool = False,
    compute_dtype=jnp.bfloat16,
    fused_early=None,
    packed_hw=None,
):
    """Quantized twin of yolov3.forward_cf — the BATCHED inference forward.

    The reference's own headline batched config is aleatoric batch-11
    (/root/reference/inference_aleatoric.py:227); its six-conv heads are
    the exact geometries the round-4 probes measured at 1.57-1.86x int8
    (BENCH_NOTES.md).  bf16 backbone once over the image batch -> entry
    quantization -> int8 head section (dropout per spec: active only for
    the bayesian variant without standard_test_dropout) -> one int8
    channels-first detection contraction per scale.

    Returns [(raw_cf (ch, batch, h*w) f32, (h, w)), ...] — drop-in for
    ops.pallas_decode.fused_box_decode_cf, same contract as forward_cf.
    """
    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], imgs,
        training=False, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )
    entry = qh["entry"]
    q32 = quantize_act(out32, entry["out32"])
    qs16 = quantize_act(skip16, entry["skip16"])
    qs8 = quantize_act(skip8, entry["skip8"])

    dropout_active = spec.mc_dropout and not standard_test_dropout
    feats = _heads_q(qh, q32, qs16, qs8, rng=rng,
                     dropout_active=dropout_active)
    out = []
    for head, f in enumerate(feats, start=1):
        out.append((quant_detection_cf(qh[f"det{head}"], f), f.shape[1:3]))
    return out


def mc_forward_cf_q(
    qh: Dict,
    params: Dict,
    stats: Dict,
    img,
    *,
    spec: VariantSpec,
    T: int,
    rng,
    compute_dtype=jnp.bfloat16,
    fused_early=None,
    packed_hw=None,
    fixed_masks=None,
):
    """Quantized twin of yolov3.mc_forward_cf (same signature + ``qh``).

    bf16 backbone once -> entry quantization -> T vmapped int8 head
    samples -> one int8 channels-first detection contraction per scale.
    Returns [(raw_cf (ch, T, NB*h*w) f32, (h, w)), ...] — drop-in for the
    fused epistemic decoder.
    """
    assert spec.variant == Variant.BAYESIAN
    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], img,
        training=False, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )
    entry = qh["entry"]
    q32 = quantize_act(out32, entry["out32"])
    qs16 = quantize_act(skip16, entry["skip16"])
    qs8 = quantize_act(skip8, entry["skip8"])

    if fixed_masks is not None:
        def one_sample(site_keys_u32):
            return _heads_q(qh, q32, qs16, qs8, fixed_site_keys=site_keys_u32)

        feats = jax.vmap(one_sample)(_fixed_key_table(fixed_masks, T))
    else:
        def one_sample(key):
            return _heads_q(qh, q32, qs16, qs8, rng=key)

        feats = jax.vmap(one_sample)(jax.random.split(rng, T))

    out = []
    for head, f in enumerate(feats, start=1):
        out.append((quant_detection_cf(qh[f"det{head}"], f), f.shape[2:4]))
    return out
