"""End-to-end accuracy parity: one trained model, two precision pipelines.

Closes BASELINE.json's "mAP & variance parity" clause at the FRAMEWORK
level (round-3 verdict #7): every piece existed — TF1 import forward
parity (test_tf1_import), an in-repo AP/LAMR scorer
(eval/detection_metrics.py), the trained-weights detection parity
(test_train_oracle) — but nothing chained training -> inference -> metric.

Harness: train the bayesian variant briefly on a fixed synthetic batch
with the PRODUCTION train step (train_loop.make_train_step: aleatoric
loss, frozen backbone, BN stats — the reference's uncertainty_training.py
recipe), then run the SAME weights and images through

  (a) the production inference pipeline at ``compute_dtype="bfloat16"``
      (the TPU default) via the public ``InferenceRunner.predict`` — on
      this CPU suite that is the XLA epistemic fallback, i.e. the same
      program the TPU runs minus the Pallas kernels (whose compiled
      parity is covered by tpu_smoke.py on the real chip);
  (b) a reference-strategy twin: f32, batch 1, per-scale sequential
      decode + NMS — the structure of inference_epistemic.py:49-128
      (the shape bench_baseline.json measures the reference at).

Both are scored against the synthetic GT with the in-repo AP/LAMR
evaluator (the ECP evaluation contract, inference_epistemic.py:1-6), and
the per-detection epistemic/aleatoric variances are compared directly.
The MC-dropout masks are (key, flat-index)-hash-keyed (ops.common), so
both pipelines draw IDENTICAL masks — the only difference is conv
compute precision, exactly the claim under test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesian_yolov3_tpu.config import Config
from bayesian_yolov3_tpu.core.priors import priors_as_array
from bayesian_yolov3_tpu.data import encode
from bayesian_yolov3_tpu.eval.detection_metrics import evaluate_detections
from bayesian_yolov3_tpu.infer.runner import InferenceRunner
from bayesian_yolov3_tpu.models.yolov3 import YoloV3
from bayesian_yolov3_tpu.ops import decode, nms
from bayesian_yolov3_tpu.train import loop as train_loop

IMG = (64, 96, 3)
T = 8
STEPS = 150
N_IMAGES = 2
N_BOXES = 3


def _train_bayesian(rng):
    """Overfit the bayesian variant on one fixed batch with the production
    train step (aleatoric loss + active MC dropout, reference
    uncertainty_training.py:23-26 recipe at an overfitting lr).

    150 unfrozen steps at lr 3e-3 measurably localizes (matches at IoU
    0.6+, confident scores; frozen-random-backbone runs never localize
    at any tested length) — enough signal for a non-vacuous metric
    comparison without a real dataset."""
    cfg = Config(
        model="bayesian", full_img_size=IMG, batch_size=N_IMAGES,
        aleatoric_loss=True, max_boxes_per_img=N_BOXES, lr=3e-3,
        compute_dtype="float32", darknet53_weights="",
        freeze_darknet53=False,
    )
    model = YoloV3.from_config(cfg)
    tables = encode.build_prior_tables(model.blueprint)
    train_step, _, optimizer = train_loop.make_train_step(model, cfg, tables)
    state = train_loop.init_state(model, cfg, jax.random.PRNGKey(0), optimizer)

    imgs = rng.uniform(0, 1, (N_IMAGES, *IMG)).astype(np.float32)
    yx = rng.uniform(0.05, 0.5, (N_IMAGES, N_BOXES, 2)).astype(np.float32)
    hw = rng.uniform(0.2, 0.45, (N_IMAGES, N_BOXES, 2)).astype(np.float32)
    bbox = np.concatenate([yx, np.minimum(yx + hw, 0.98)], axis=2)
    label = rng.integers(0, 2, (N_IMAGES, N_BOXES)).astype(np.int32)
    batch = {
        "image": jnp.asarray((imgs * 255).astype(np.uint8)),
        "bbox": jnp.asarray(bbox),
        "label": jnp.asarray(label),
        "valid": jnp.ones((N_IMAGES, N_BOXES), bool),
    }
    step = jax.jit(train_step)
    key = jax.random.PRNGKey(11)
    metrics = None
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["total"]))
    params = train_loop.merge_params(state["params"], state["frozen"])
    params = jax.tree.map(np.asarray, params)
    # BN moving stats at momentum 0.99 are only ~33% converged after 40
    # steps — inference-mode BN on them is noise (the pitfall documented
    # in test_train_oracle).  Recover the FINAL params' exact batch
    # statistics algebraically from one more stats update:
    #   s' = 0.99 s + 0.01 b  =>  b = (s' - 0.99 s) / 0.01
    # (exact also for frozen-backbone layers, where s' == s gives b == s).
    state2, _ = step(state, batch, jax.random.PRNGKey(12))
    stats = jax.tree.map(
        lambda new, old: np.asarray((new - 0.99 * old) / 0.01),
        state2["stats"], state["stats"],
    )
    stats = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (np.maximum(leaf, 1e-8)
                            if path[-1].key == "var" else leaf),
        stats,
    )
    # +1 shift parity (dataset labels start at 1, dataset_utils.py:43-51)
    gt = {
        b: (bbox[b], label[b] + 1) for b in range(N_IMAGES)
    }
    return params, stats, (imgs * 255).astype(np.uint8), gt


def _score(rows_by_img, spec, cls_cnt=2):
    """(rows, valid) per image -> AP/LAMR inputs + variance columns.

    score = obj_mean * max cls_mean, label = argmax cls (+1 implicit
    background shift), the reference's detect.py:36-63 contract.
    """
    obj = spec.obj_idx(epistemic=True)
    cls0 = spec.cls_start_idx(epistemic=True)
    preds, variances = {}, {}
    for b, (rows, valid) in rows_by_img.items():
        r = rows[valid]
        cls_scores = r[:, cls0 : cls0 + cls_cnt]
        preds[b] = (
            r[:, :4],
            r[:, obj] * cls_scores.max(axis=1),
            cls_scores.argmax(axis=1) + 1,
        )
        # [epi_loc_var(4), ale_var_loc(4), total_var_epi, total_var_ale]
        variances[b] = r[:, 4:14]
    return preds, variances


def test_trained_model_metric_parity_bf16_vs_f32(trained_bayesian):
    params, stats, imgs_u8, gt = trained_bayesian
    key = jax.random.PRNGKey(99)

    # (a) production pipeline, TPU default precision (bf16)
    cfg_prod = Config(
        model="bayesian", full_img_size=IMG, T=T, inference_mode=True,
        compute_dtype="bfloat16", darknet53_weights="", nms_max_boxes=64,
    )
    runner = InferenceRunner(cfg_prod)
    prod = {}
    for b in range(N_IMAGES):
        rows, valid = runner.predict(params, stats, imgs_u8[b : b + 1],
                                     jax.random.fold_in(key, b))
        prod[b] = (rows[0], valid[0])

    # (b) reference-strategy twin: f32, batch 1, sequential per-scale decode
    model = YoloV3.from_config(
        Config(model="bayesian", full_img_size=IMG, T=T, inference_mode=True,
               compute_dtype="float32", darknet53_weights="")
    )
    pri = priors_as_array(model.priors)
    obj_idx = model.spec.obj_idx(epistemic=True)

    @jax.jit
    def ref_pipeline(p, s, img, k):
        raws = model.mc_forward(p, s, img, T=T, rng=k)
        per_scale = []
        for i, (raw, stride) in enumerate(zip(raws, (32, 16, 8))):
            det = decode.split_detection(raw, model.spec)
            st = decode.decode_epistemic_stats(det)
            per_scale.append(
                decode.decode_bbox_epistemic(st, jnp.asarray(pri[stride]),
                                             layer_id=i)
            )
        flat = decode.concat_all_scales(per_scale)
        return nms.nms_select(flat, obj_idx, max_out=64)[:2]

    ref = {}
    for b in range(N_IMAGES):
        img = jnp.asarray(imgs_u8[b : b + 1]).astype(jnp.float32) / 255.0
        rows, valid = ref_pipeline(params, stats, img,
                                   jax.random.fold_in(key, b))
        ref[b] = (np.asarray(rows), np.asarray(valid))

    preds_prod, var_prod = _score(prod, runner.spec)
    preds_ref, var_ref = _score(ref, model.spec)

    metrics_prod = evaluate_detections(preds_prod, gt, [1, 2])
    metrics_ref = evaluate_detections(preds_ref, gt, [1, 2])

    # non-vacuous: the overfit model must actually detect — positive mAP
    # requires a true-positive match (IoU >= 0.5) ranked above the noise,
    # and each image must carry at least one confident detection
    assert metrics_ref["mAP"] > 0.05, metrics_ref
    for b in range(N_IMAGES):
        assert preds_ref[b][1].max() > 0.5, (b, preds_ref[b][1].max())
    # the BASELINE.json parity clause, at framework level: same weights,
    # bf16 production pipeline vs f32 reference strategy, metric-identical
    assert abs(metrics_prod["mAP"] - metrics_ref["mAP"]) <= 1e-3, (
        metrics_prod, metrics_ref)
    for c in (1, 2):
        lp = metrics_prod["per_class"][c]["lamr"]
        lr_ = metrics_ref["per_class"][c]["lamr"]
        if np.isnan(lp) and np.isnan(lr_):
            continue
        assert abs(lp - lr_) <= 1e-2, (c, lp, lr_)

    # variance parity on matched detections: greedy-match each production
    # detection to the nearest reference detection (IoU >= 0.7) and compare
    # the epistemic/aleatoric variance columns.  bf16 convs perturb the
    # per-sample logits; the T-sample moments see that as extra jitter, so
    # the tolerance is statistical, not ulp-level.
    from bayesian_yolov3_tpu.eval.detection_metrics import _iou_matrix

    n_matched = 0
    for b in range(N_IMAGES):
        bp, br = preds_prod[b][0], preds_ref[b][0]
        if not (len(bp) and len(br)):
            continue
        iou = _iou_matrix(bp, br)
        for i in range(len(bp)):
            j = int(iou[i].argmax())
            if iou[i, j] < 0.7 or preds_prod[b][1][i] < 0.5:
                continue
            n_matched += 1
            vp, vr = var_prod[b][i], var_ref[b][j]
            np.testing.assert_allclose(
                vp, vr, rtol=0.35, atol=1e-7,
                err_msg=f"variance columns diverge at img {b} det {i}",
            )
    assert n_matched >= N_IMAGES  # at least one confident match per image
