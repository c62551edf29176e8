"""Compiled-kernel parity smoke for the real TPU chip.

Every Pallas kernel in the production surface runs COMPILED (Mosaic, not
interpret) at reduced shapes and is checked against its XLA twin — the
same comparisons tests/test_pallas*.py make in interpreter mode on CPU.
This puts compiled-mode parity on the driver's evidence path: a Mosaic
lowering change or a layout edit that breaks the real-TPU path fails here
even while the CPU suite stays green (round-3 verdict #3).

Usage: `python tpu_smoke.py` on the chip.  Writes TPU_SMOKE.json
({check: {ok, max_dev, note}}, one artifact per round next to
BENCH_rNN.json) and exits non-zero if any check fails.

Tolerances mirror the interpret-mode tests: both paths run bf16 convs
with f32 accumulation, so conv-chain checks allow bf16 reduction-order
noise (0.05/0.06 abs); the f32 decode kernels get the tight decode
tolerances; NMS selection must be index-exact.
"""

import json
import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp

BF = jnp.bfloat16
RESULTS = {}


def check(name):
    def deco(fn):
        def run():
            try:
                max_dev = fn()
                RESULTS[name] = {"ok": True, "max_dev": float(max_dev)}
                print(f"  ok   {name}: max_dev {max_dev:.3e}")
            except Exception as e:  # noqa: BLE001 — smoke must report, not die
                RESULTS[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                print(f"  FAIL {name}: {e}")
                traceback.print_exc()
        run.check_name = name
        return run
    return deco


def _dev(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    return np.max(np.abs(got - want))


def _assert_close(got, want, atol):
    d = _dev(got, want)
    assert d <= atol, f"max_dev {d:.3e} > {atol}"
    return d


# ---------------------------------------------------------------------------
# pallas_conv: the fused early-backbone chain (stem, res, downsample, packed
# phases) via the whole-backbone toggle — tests/test_pallas_conv.py:133
# compiled.  Covers every kernel the production fused path dispatches.
# ---------------------------------------------------------------------------
@check("pallas_conv_fused_early_backbone")
def conv_chain():
    from bayesian_yolov3_tpu.models import darknet

    params, stats = darknet.init_darknet53(jax.random.PRNGKey(0))
    r = np.random.default_rng(9)
    # the ECP width: hw=512 triggers the fused 256-stage extension at
    # the exact lane geometry production takes
    x = jnp.asarray(r.uniform(0, 1, (1, 64, 1920, 3)), jnp.float32)
    want = darknet.darknet53(params, stats, x, training=False,
                             compute_dtype=BF, fused_early=False)
    got = darknet.darknet53(params, stats, x, training=False,
                            compute_dtype=BF, fused_early=True)
    # (out32, skip16, skip8, stats) — compare the three feature maps
    return max(_assert_close(g, w, 0.05)
               for g, w in zip(got[:3], want[:3]))


@check("pallas_conv_packed_host_input")
def conv_packed_input():
    from bayesian_yolov3_tpu.data.pipeline import pack_planes_host
    from bayesian_yolov3_tpu.models import darknet

    params, stats = darknet.init_darknet53(jax.random.PRNGKey(1))
    r = np.random.default_rng(12)
    img8 = r.integers(0, 256, (64, 1920, 3), dtype=np.uint8)
    imgf = jnp.asarray(img8[None], jnp.float32) / 255.0
    want = darknet.darknet53(params, stats, imgf, training=False,
                             compute_dtype=BF, fused_early=True)
    planes = jnp.asarray(pack_planes_host(img8)[None])
    got = darknet.darknet53(params, stats, planes, training=False,
                            compute_dtype=BF, packed_hw=(64, 1920))
    return max(_assert_close(g, w, 0.05)
               for g, w in zip(got[:3], want[:3]))


# ---------------------------------------------------------------------------
# pallas_epistemic: fused decode, batched (anchor-folding) variant, and the
# split moments+finalize formulation the mc-sharded pipeline uses —
# tests/test_pallas.py compiled.  All-f32 kernels: tight tolerances.
# ---------------------------------------------------------------------------
C = 2
PRIORS = np.array([[0.3, 0.1], [0.15, 0.05], [0.08, 0.02]], np.float32)


def _epi_cols_close(got, want):
    np.testing.assert_allclose(got[..., :12], want[..., :12],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[..., 12], want[..., 12],
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(got[..., 13:], want[..., 13:],
                               rtol=1e-4, atol=2e-4)
    return _dev(got, want)


@check("pallas_epistemic_fused_decode")
def epistemic_decode():
    from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
    from bayesian_yolov3_tpu.ops import decode
    from bayesian_yolov3_tpu.ops.pallas_epistemic import fused_epistemic_decode

    spec = VariantSpec(Variant.BAYESIAN, C)
    h, w, T = 8, 16, 8
    r = np.random.default_rng(2)
    raw = r.standard_normal(
        (T, h, w, 3 * spec.head_channels_per_prior)).astype(np.float32)
    det = decode.split_detection(jnp.asarray(raw), spec)
    st = decode.decode_epistemic_stats(det)
    want = np.asarray(decode.decode_bbox_epistemic(
        st, jnp.asarray(PRIORS), layer_id=1))
    got = np.asarray(fused_epistemic_decode(
        jnp.asarray(raw), jnp.asarray(PRIORS), cls_cnt=C, layer_id=1))
    return _epi_cols_close(got, want)


@check("pallas_epistemic_batched_decode")
def epistemic_batched():
    from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
    from bayesian_yolov3_tpu.ops import decode
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        fused_epistemic_decode_cf_batched,
    )

    spec = VariantSpec(Variant.BAYESIAN, C)
    T, nb, h, w = 5, 2, 8, 16
    chpp = spec.head_channels_per_prior
    r = np.random.default_rng(3)
    raw = r.standard_normal((3 * chpp, T, nb * h * w)).astype(np.float32)
    got = np.asarray(fused_epistemic_decode_cf_batched(
        jnp.asarray(raw), jnp.asarray(PRIORS), n_imgs=nb, h=h, w=w,
        cls_cnt=C, layer_id=0))
    dev = 0.0
    for b in range(nb):
        raw_b = raw[:, :, b * h * w:(b + 1) * h * w]
        raw_thwc = raw_b.transpose(1, 2, 0).reshape(T, h, w, 3 * chpp)
        det = decode.split_detection(jnp.asarray(raw_thwc), spec)
        st = decode.decode_epistemic_stats(det)
        ref = decode.decode_bbox_epistemic(st, jnp.asarray(PRIORS), layer_id=0)
        want = np.asarray(ref).transpose(2, 0, 1, 3).reshape(3 * h * w, -1)
        dev = max(dev, _epi_cols_close(got[b], want))
    return dev


@check("pallas_epistemic_moments_finalize")
def epistemic_moments():
    from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
    from bayesian_yolov3_tpu.ops import decode
    from bayesian_yolov3_tpu.ops.pallas_epistemic import (
        epistemic_finalize,
        epistemic_moments_cf,
        fused_epistemic_decode_cf,
    )

    spec = VariantSpec(Variant.BAYESIAN, C)
    h, w, T, n_shards = 8, 16, 8, 4
    chpp = spec.head_channels_per_prior
    r = np.random.default_rng(4)
    raw_cf = r.standard_normal((3 * chpp, T, h * w)).astype(np.float32)
    want = np.asarray(fused_epistemic_decode_cf(
        jnp.asarray(raw_cf), jnp.asarray(PRIORS), h=h, w=w, cls_cnt=C,
        layer_id=2))
    want_flat = np.asarray(decode.concat_all_scales([jnp.asarray(want)]))
    shard_T = T // n_shards
    moments = sum(
        np.asarray(epistemic_moments_cf(
            jnp.asarray(raw_cf[:, s * shard_T:(s + 1) * shard_T]), cls_cnt=C))
        for s in range(n_shards))
    got = np.asarray(epistemic_finalize(
        jnp.asarray(moments), jnp.asarray(PRIORS), T=T, h=h, w=w,
        cls_cnt=C, layer_id=2))
    return _epi_cols_close(got[0], want_flat)


# ---------------------------------------------------------------------------
# pallas_decode: the batched box decode (standard + aleatoric heads) —
# tests/test_pallas.py:43 compiled.
# ---------------------------------------------------------------------------
@check("pallas_decode_fused_box_decode")
def box_decode():
    from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
    from bayesian_yolov3_tpu.ops import decode
    from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_cf

    dev = 0.0
    for variant, aleatoric in ((Variant.ALEATORIC, True),
                               (Variant.STANDARD, False)):
        spec = VariantSpec(variant, C)
        nb, h, w = 2, 8, 16
        chpp = spec.head_channels_per_prior
        r = np.random.default_rng(5)
        raw = r.standard_normal((nb, h, w, 3 * chpp)).astype(np.float32)
        det = decode.split_detection(jnp.asarray(raw), spec)
        ref = (decode.decode_bbox_aleatoric if aleatoric
               else decode.decode_bbox_standard)(
                   det, jnp.asarray(PRIORS), layer_id=1)
        want = np.stack([
            np.asarray(ref[b]).transpose(2, 0, 1, 3).reshape(3 * h * w, -1)
            for b in range(nb)])
        raw_cf = jnp.asarray(raw.reshape(nb, h * w, 3 * chpp).transpose(2, 0, 1))
        got = np.asarray(fused_box_decode_cf(
            raw_cf, jnp.asarray(PRIORS), h=h, w=w, cls_cnt=C, layer_id=1,
            aleatoric=aleatoric))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        dev = max(dev, _dev(got, want))
    return dev


# ---------------------------------------------------------------------------
# pallas_nms: single-image sequential kernel + the image-vectorized kernel —
# tests/test_nms.py:132,156 compiled.  Selection must be index-EXACT.
# ---------------------------------------------------------------------------
def _random_boxes(rng, n):
    yx = rng.uniform(0, 0.9, (n, 2))
    hw = rng.uniform(0.01, 0.3, (n, 2))
    boxes = np.concatenate([yx, yx + hw], axis=1).astype(np.float32)
    return boxes, rng.uniform(0, 1, n).astype(np.float32)


@check("pallas_nms_sequential")
def nms_seq():
    from bayesian_yolov3_tpu.ops import nms
    from bayesian_yolov3_tpu.ops.pallas_nms import greedy_nms_pallas

    r = np.random.default_rng(6)
    boxes, scores = _random_boxes(r, 1024)
    want_idx, want_cnt = nms.greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 100, 0.5)
    got_idx, got_cnt = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 100, 0.5)
    assert int(got_cnt) == int(want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    return 0.0


@check("pallas_nms_imgvec")
def nms_imgvec():
    from bayesian_yolov3_tpu.ops import nms
    from bayesian_yolov3_tpu.ops.pallas_nms import greedy_nms_pallas_imgvec

    r = np.random.default_rng(7)
    nb, n = 4, 512
    boxes = np.stack([_random_boxes(r, n)[0] for _ in range(nb)])
    scores = np.stack([_random_boxes(r, n)[1] for _ in range(nb)])
    scores[1, :] = -np.inf           # empty image
    scores[2, 10:20] = scores[2, 5]  # exact ties
    boxes[3, 50:] = boxes[3, :1]     # heavy suppression
    got_idx, got_cnt = greedy_nms_pallas_imgvec(
        jnp.asarray(boxes), jnp.asarray(scores), 100, 0.5)
    for b in range(nb):
        want_idx, want_cnt = nms.greedy_nms(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 100, 0.5)
        assert int(got_cnt[b]) == int(want_cnt), b
        np.testing.assert_array_equal(np.asarray(got_idx[b]),
                                      np.asarray(want_idx))
    return 0.0


# ---------------------------------------------------------------------------
# quant: the int8 PTQ head section (models.quant) — the one production
# surface that is XLA-int8 rather than Mosaic; asserts the chip's int8
# conv/dot lowering tracks the float raws (tests/test_quant.py:40 compiled,
# loose PTQ tolerances — quantization error, not kernel parity).  Reported
# max_dev is the worst per-scale RELATIVE max error.
# ---------------------------------------------------------------------------
@check("quant_int8_head_section")
def quant_int8():
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.models.quant import mc_forward_cf_q
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, mc_forward_cf
    from bayesian_yolov3_tpu.ops.quant import calibrate_mc_amax, quantize_heads

    img_size, t, seed = (64, 96, 3), 6, 123  # fixed masks: identical keys
    cfg = Config(model="bayesian", full_img_size=img_size, T=t,
                 inference_mode=True, compute_dtype="float32",
                 darknet53_weights="")
    model = YoloV3.from_config(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    r = np.random.default_rng(8)
    imgs = jnp.asarray(r.uniform(0, 1, (2, *img_size)), jnp.float32)
    amax = calibrate_mc_amax(params, stats, imgs, spec=model.spec, T=t,
                             rng=jax.random.PRNGKey(1))
    qh = quantize_heads(params, stats, model.spec, amax)
    outs_f = mc_forward_cf(params, stats, imgs[:1], spec=model.spec, T=t,
                           rng=None, fixed_masks=seed)
    # compute_dtype=f32 on BOTH paths so only the int8 head lowering
    # differs (mc_forward_cf_q's default is bf16, which would mix bf16
    # backbone noise into the parity signal — ADVICE r4)
    outs_q = mc_forward_cf_q(qh, params, stats, imgs[:1], spec=model.spec,
                             T=t, rng=None, fixed_masks=seed,
                             compute_dtype=jnp.float32)
    worst = 0.0
    for (raw_f, _), (raw_q, _) in zip(outs_f, outs_q):
        a = np.asarray(raw_f, np.float64).ravel()
        b = np.asarray(raw_q, np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.995, f"corr {corr}"
        rel = np.abs(a - b).max() / np.abs(a).max()
        assert rel < 0.10, f"rel max err {rel}"
        worst = max(worst, rel)
    return worst


@check("quant_int8_batched_heads")
def quant_int8_batched():
    """The batched standard/aleatoric int8 section (round 5, VERDICT #1):
    forward_cf vs forward_cf_q on the chip's int8 conv/dot lowering.
    Deterministic section (no dropout) -> only quantization error."""
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.models.quant import forward_cf_q
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, forward_cf
    from bayesian_yolov3_tpu.ops.quant import (
        calibrate_forward_amax,
        quantize_heads,
    )

    img_size = (64, 96, 3)
    worst = 0.0
    for variant in ("aleatoric", "standard"):
        cfg = Config(model=variant, full_img_size=img_size,
                     compute_dtype="float32", darknet53_weights="")
        model = YoloV3.from_config(cfg)
        params, stats = model.init(jax.random.PRNGKey(0))
        r = np.random.default_rng(10)
        imgs = jnp.asarray(r.uniform(0, 1, (2, *img_size)), jnp.float32)
        amax = calibrate_forward_amax(params, stats, imgs, spec=model.spec)
        qh = quantize_heads(params, stats, model.spec, amax)
        outs_f = forward_cf(params, stats, imgs, spec=model.spec)
        outs_q = forward_cf_q(qh, params, stats, imgs, spec=model.spec,
                              compute_dtype=jnp.float32)
        for (raw_f, _), (raw_q, _) in zip(outs_f, outs_q):
            a = np.asarray(raw_f, np.float64).ravel()
            b = np.asarray(raw_q, np.float64).ravel()
            corr = np.corrcoef(a, b)[0, 1]
            assert corr > 0.995, f"corr {corr}"
            rel = np.abs(a - b).max() / np.abs(a).max()
            assert rel < 0.10, f"rel max err {rel}"
            worst = max(worst, rel)
    return worst


CHECKS = [conv_chain, conv_packed_input, epistemic_decode, epistemic_batched,
          epistemic_moments, box_decode, nms_seq, nms_imgvec, quant_int8,
          quant_int8_batched]


def main():
    platform = jax.devices()[0].platform
    print(f"tpu_smoke on {platform} ({jax.devices()[0]})")
    for c in CHECKS:
        c()
    ok = all(r["ok"] for r in RESULTS.values())
    artifact = {"platform": platform, "ok": ok, "checks": RESULTS}
    with open("TPU_SMOKE.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"ok": ok,
                      "passed": sum(r["ok"] for r in RESULTS.values()),
                      "total": len(RESULTS)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
