"""The three YOLOv3 variants: standard, aleatoric, bayesian (MC-dropout).

Topology parity with lib_yolo/yolov3.py:232-628: three detection heads at
strides 32/16/8, each six convs + a 1x1 linear detection conv; heads 2/3
branch from the 5th conv of the previous head (512/256 ch), 1x1-reduce,
2x nearest-upsample, and concat the backbone skip at stride 16/8
(reference layers 61/36).

TPU-first redesign of the reference's MC-dropout inference: instead of
replicating the backbone output T times along the batch axis
(``stack_feature_map``, yolov3.py:538-541, layers.py:595-597), ``mc_forward``
runs the deterministic backbone once and ``vmap``s the dropout-bearing head
section over T PRNG keys — one compiled program, a real sample axis that can
be sharded across chips.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.blueprint import ModelBlueprint, Variant, VariantSpec
from ..core.priors import PriorSet
from ..ops.common import conv_block, detection_conv, init_conv_block, init_detection_conv, upsample2x
from . import darknet

DROP_PROB = 0.1  # hard-coded in the reference (yolov3.py:462)

# per-head conv channel plans: six (kernel, cout) convs; the 5th conv (index
# 4) is the branch point feeding the next scale (reference route [-3]).
_HEAD_PLANS = {
    1: ((1, 512), (3, 1024), (1, 512), (3, 1024), (1, 512), (3, 1024)),
    2: ((1, 256), (3, 512), (1, 256), (3, 512), (1, 256), (3, 512)),
    3: ((1, 128), (3, 256), (1, 128), (3, 256), (1, 128), (3, 256)),
}
_TRANS_PLANS = {1: (1, 256), 2: (1, 128)}  # 1x1 reduce before upsample
_BRANCH_IDX = 4  # dropout on convs 0..4, none on conv 5 (yolov3.py:544-551)


def init_yolov3(rng, spec: VariantSpec) -> Tuple[Dict, Dict]:
    """Initialize the full parameter/stat pytrees (flat name -> block)."""
    kb, kh = jax.random.split(rng)
    params, stats = darknet.init_darknet53(kb)
    params = {"backbone": params}
    stats = {"backbone": stats}

    head_cout = spec.head_channels_per_prior * 3  # 3 priors per scale
    cins = {1: 1024, 2: 256 + 512, 3: 128 + 256}  # concat of upsample + skip
    keys = jax.random.split(kh, 32)
    ki = 0
    for head in (1, 2, 3):
        cin = cins[head]
        for j, (k, cout) in enumerate(_HEAD_PLANS[head]):
            p, s = init_conv_block(keys[ki], k, cin, cout)
            ki += 1
            params[f"head{head}_conv{j}"] = p
            stats[f"head{head}_conv{j}"] = s
            cin = cout
        params[f"det{head}"] = init_detection_conv(keys[ki], cin, head_cout)
        ki += 1
        if head in _TRANS_PLANS:
            k, cout = _TRANS_PLANS[head]
            branch_c = _HEAD_PLANS[head][_BRANCH_IDX][1]
            p, s = init_conv_block(keys[ki], k, branch_c, cout)
            ki += 1
            params[f"trans{head}"] = p
            stats[f"trans{head}"] = s
    return params, stats


def _heads(
    params: Dict,
    stats: Dict,
    dn_out,
    skip16,
    skip8,
    *,
    spec: VariantSpec,
    training: bool,
    dropout_active: bool,
    rng=None,
    fixed_site_keys=None,
    compute_dtype=jnp.float32,
    return_features: bool = False,
    capture=None,
):
    """Everything after the backbone: 3 det heads + scale transitions.

    Returns ((raw1, raw2, raw3), new_stats).  Dropout (p=0.1) runs on head
    convs 0..4 of each head when ``dropout_active`` (bayesian variant only;
    the transition convs and the final pre-detection conv are dropout-free,
    parity yolov3.py:543-622).

    ``fixed_site_keys``: (15,) uint32 — one fixed dropout key per site in
    traversal order, used instead of splitting ``rng`` (the fixed-MC-masks
    fast path, see ``mc_forward_cf``).

    ``return_features=True`` returns the pre-detection-conv activations
    instead of detection outputs (the MC-sharded fast path applies the
    1x1 head as one channels-first contraction over all T samples).

    ``capture`` (dict or None): when given, every conv block's output is
    stored under its name — the int8 calibration hook
    (ops.quant.calibrate_mc_amax reduces them to scalar maxima in-graph).
    """
    new_stats = {}
    if dropout_active and fixed_site_keys is None:
        assert rng is not None, "MC dropout requires an rng key"
        site_keys = jax.random.split(rng, 15)  # 5 dropout sites x 3 heads
    site = 0

    def run_block(name, x, drop):
        nonlocal site
        drop_rate = DROP_PROB if (drop and dropout_active) else None
        key = key32 = None
        if drop_rate is not None:
            if fixed_site_keys is not None:
                key32 = fixed_site_keys[site]
            else:
                key = site_keys[site]
            site += 1
        y, s = conv_block(
            params[name], stats[name], x,
            training=training, drop_rate=drop_rate, rng=key,
            drop_key_u32=key32, compute_dtype=compute_dtype,
        )
        new_stats[name] = s
        if capture is not None:
            capture[name] = y
        return y

    raws = []
    x = dn_out
    for head, skip in ((1, None), (2, skip16), (3, skip8)):
        if skip is not None:
            x = run_block(f"trans{head - 1}", x, drop=False)
            x = upsample2x(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        branch = None
        for j in range(6):
            x = run_block(f"head{head}_conv{j}", x, drop=j <= _BRANCH_IDX)
            if j == _BRANCH_IDX:
                branch = x
        if return_features:
            raws.append(x)
        else:
            raws.append(
                detection_conv(params[f"det{head}"], x, compute_dtype=compute_dtype)
            )
        x = branch
    return tuple(raws), new_stats


def forward(
    params: Dict,
    stats: Dict,
    imgs,
    *,
    spec: VariantSpec,
    training: bool = False,
    freeze_backbone: bool = True,
    rng=None,
    standard_test_dropout: bool = False,
    compute_dtype=jnp.float32,
    fused_early=None,
    packed_hw=None,
):
    """Single forward pass.  Returns ((raw1, raw2, raw3), new_stats).

    raw_i is the f32 detection-conv output at scale i, shape
    (N, H/stride, W/stride, 3 * head_channels_per_prior).

    ``standard_test_dropout=True`` disables dropout at inference for the
    bayesian variant.  (In the reference this path is a silent no-op bug —
    layers.py:567-568 discards the dropout result — which already makes it
    behave as "dropout off"; we implement the evident intent directly.)
    """
    backbone_training = training and not freeze_backbone
    out32, skip16, skip8, bstats = darknet.darknet53(
        params["backbone"], stats["backbone"], imgs,
        training=backbone_training, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )
    dropout_active = spec.mc_dropout and not standard_test_dropout
    raws, hstats = _heads(
        params, stats, out32, skip16, skip8,
        spec=spec, training=training, dropout_active=dropout_active,
        rng=rng, compute_dtype=compute_dtype,
    )
    new_stats = dict(hstats)
    new_stats["backbone"] = bstats
    return raws, new_stats


def _fixed_key_table(seed, T: int):
    """Constant (T, 15) uint32 dropout-key table for the fixed-MC-masks
    mode: one key per (sample, site).  Philox gives independent
    high-quality streams from the int seed; the table is a LITERAL in the
    jaxpr, so the masks carry no runtime dependence and inference is
    deterministic (see ``mc_forward_cf``)."""
    import numpy as np

    return jnp.asarray(
        np.random.Generator(np.random.Philox(int(seed)))
        .integers(0, 2**32, size=(T, 15), dtype=np.uint32)
    )


def mc_forward(
    params: Dict,
    stats: Dict,
    img,
    *,
    spec: VariantSpec,
    T: int,
    rng,
    compute_dtype=jnp.float32,
    fused_early=None,
    packed_hw=None,
    fixed_masks=None,
):
    """T-sample MC-dropout forward for epistemic inference (batch size 1).

    Backbone runs once (it has no dropout, yolov3.py:530-536); the head
    section is vmapped over T per-sample PRNG keys.  Returns three raw
    tensors of shape (T, h, w, ch) — the sample axis replaces the
    reference's batch-stacking (inference_epistemic.py:49, yolov3.py:538-541).

    ``fixed_masks`` (int seed or None): deterministic mode — same constant
    per-(sample, site) key table as ``mc_forward_cf`` (see its docstring),
    so both paths draw bit-identical masks for the same seed and T.
    """
    assert spec.variant == Variant.BAYESIAN
    assert img.shape[0] == 1, "epistemic inference requires batch_size == 1"
    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], img,
        training=False, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )

    if fixed_masks is not None:
        def one_sample_fixed(site_keys_u32):
            raws, _ = _heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True,
                fixed_site_keys=site_keys_u32, compute_dtype=compute_dtype,
            )
            return tuple(r[0] for r in raws)

        return jax.vmap(one_sample_fixed)(_fixed_key_table(fixed_masks, T))

    def one_sample(key):
        raws, _ = _heads(
            params, stats, out32, skip16, skip8,
            spec=spec, training=False, dropout_active=True, rng=key,
            compute_dtype=compute_dtype,
        )
        return tuple(r[0] for r in raws)  # squeeze the batch axis

    keys = jax.random.split(rng, T)
    return jax.vmap(one_sample)(keys)


def mc_forward_cf(
    params: Dict,
    stats: Dict,
    img,
    *,
    spec: VariantSpec,
    T: int,
    rng,
    compute_dtype=jnp.float32,
    fused_early=None,
    packed_hw=None,
    fixed_masks=None,
):
    """T-sample MC forward emitting CHANNELS-FIRST raw heads.

    Like ``mc_forward`` but the 1x1 detection convs are applied as one
    channels-first MXU contraction over the stacked samples
    (ops.common.detection_conv_cf), yielding (ch, T, NB*h*w) f32 per
    scale — the native input layout of the fused Pallas epistemic decoder,
    with no relayout transpose in between.

    Unlike the reference (batch 1 enforced by its stacked-batch graph,
    inference_epistemic.py:193,213), an image batch NB >= 1 is supported:
    the batch folds onto the anchor axis, with per-image epistemic
    statistics computed downstream.  Dropout masks are drawn per
    (sample, image, position), so every image sees independent MC noise.

    ``fixed_masks`` (int seed or None): reuse the SAME T dropout-mask sets
    for every image — the per-(sample, site) hash keys become compile-time
    constants derived from the seed.  This is a DETERMINISM feature, not a
    throughput one: measured throughput-neutral vs keyed masks (the
    ~8.7 ms/img mask cost at T=30 is the per-element draw itself, which
    constant keys do not remove — BENCH_NOTES.md round 4, keyed 21.06 vs
    fixed 21.29 img/s).  Statistically this is MC
    integration with T fixed posterior weight samples: per-image epistemic
    statistics have the same distribution as fresh-mask sampling at the
    same T; estimator noise is correlated ACROSS images instead of
    independent.  It also makes epistemic inference deterministic (same
    image -> same uncertainties).  ``rng`` is ignored when set.  The
    reference has no counterpart (fresh masks per image,
    inference_epistemic.py:49); default off.

    Returns [(raw_cf (ch, T, NB*h*w), (h, w)), ...].
    """
    from ..ops.common import detection_conv_cf

    assert spec.variant == Variant.BAYESIAN
    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], img,
        training=False, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )

    # NOTE: a fused Pallas head section (conv + dropout mask + BN + leaky in
    # one VMEM pass) was built and measured in rounds 3-4 and DELETED: at
    # best it tied the XLA heads (42.5 vs 40.2 ms; section MFUs 70-86%,
    # h3 HBM-bound at ~1.7 GB/pair), so it never earned its 950 LoC.  The
    # measurements live in BENCH_NOTES.md ("fused Pallas head section" dead
    # end); the code is in git history (ops/pallas_heads.py,
    # models/heads_pallas.py, removed round 4).
    if fixed_masks is not None:
        key_table = _fixed_key_table(fixed_masks, T)

        def one_sample_fixed(site_keys_u32):
            feats, _ = _heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True,
                fixed_site_keys=site_keys_u32,
                compute_dtype=compute_dtype, return_features=True,
            )
            return feats

        feats = jax.vmap(one_sample_fixed)(key_table)
    else:
        def one_sample(key):
            feats, _ = _heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True, rng=key,
                compute_dtype=compute_dtype, return_features=True,
            )
            return feats

        keys = jax.random.split(rng, T)
        feats = jax.vmap(one_sample)(keys)  # 3 x (T, NB, h, w, cfeat)
    out = []
    for head, f in enumerate(feats, start=1):
        raw_cf = detection_conv_cf(
            params[f"det{head}"], f, compute_dtype=compute_dtype
        )
        out.append((raw_cf, f.shape[2:4]))
    return out


def forward_cf(
    params: Dict,
    stats: Dict,
    imgs,
    *,
    spec: VariantSpec,
    rng=None,
    standard_test_dropout: bool = False,
    compute_dtype=jnp.float32,
    fused_early=None,
    packed_hw=None,
):
    """Batched inference forward emitting CHANNELS-FIRST raw heads.

    Standard/aleatoric inference counterpart of ``mc_forward_cf``: the 1x1
    detection convs run as channels-first contractions over the batch,
    feeding ops.pallas_decode.fused_box_decode_cf without a relayout.
    Returns [(raw_cf (ch, batch, h*w), (h, w)), ...].
    """
    from ..ops.common import detection_conv_cf

    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], imgs,
        training=False, compute_dtype=compute_dtype,
        fused_early=fused_early, packed_hw=packed_hw,
    )
    dropout_active = spec.mc_dropout and not standard_test_dropout
    feats, _ = _heads(
        params, stats, out32, skip16, skip8,
        spec=spec, training=False, dropout_active=dropout_active, rng=rng,
        compute_dtype=compute_dtype, return_features=True,
    )
    out = []
    for head, f in enumerate(feats, start=1):
        raw_cf = detection_conv_cf(params[f"det{head}"], f, compute_dtype=compute_dtype)
        out.append((raw_cf, f.shape[1:3]))
    return out


@dataclasses.dataclass
class YoloV3:
    """Convenience holder mirroring the reference's per-variant classes
    (yolov3.py:176-230): spec + priors + blueprint + freeze flag, with
    ``init`` / ``forward`` / ``mc_forward`` bound to them.
    """

    spec: VariantSpec
    priors: PriorSet
    img_size: Tuple[int, int, int]
    freeze_darknet53: bool = True
    compute_dtype: str = "float32"

    def __post_init__(self):
        self.blueprint = ModelBlueprint.build(self.img_size, self.priors, self.spec.cls_cnt)
        self.cls_cnt = self.spec.cls_cnt
        self.obj_idx = self.spec.obj_idx(epistemic=False)
        self.cls_start_idx = self.spec.cls_start_idx(epistemic=False)

    @classmethod
    def from_config(cls, config) -> "YoloV3":
        return cls(
            spec=config.variant_spec,
            priors=config.resolved_priors(),
            img_size=config.img_size,
            freeze_darknet53=config.freeze_darknet53,
            compute_dtype=config.compute_dtype,
        )

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    def init(self, rng):
        return init_yolov3(rng, self.spec)

    def forward(self, params, stats, imgs, *, training=False, rng=None,
                standard_test_dropout=False, packed_hw=None):
        return forward(
            params, stats, imgs, spec=self.spec, training=training,
            freeze_backbone=self.freeze_darknet53, rng=rng,
            standard_test_dropout=standard_test_dropout,
            compute_dtype=self._dtype, packed_hw=packed_hw,
        )

    def mc_forward(self, params, stats, img, *, T, rng, fixed_masks=None):
        return mc_forward(params, stats, img, spec=self.spec, T=T, rng=rng,
                          compute_dtype=self._dtype, fixed_masks=fixed_masks)

    def load_darknet53_weights(self, weightfile, params, stats):
        bp, bs = darknet.load_darknet53_weights(
            weightfile, params["backbone"], stats["backbone"]
        )
        return {**params, "backbone": bp}, {**stats, "backbone": bs}
