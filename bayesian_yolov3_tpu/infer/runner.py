"""Inference runners: tfrecords -> detections -> ECP JSON files.

One runner covers the reference's three scripts (same skeleton each:
TestingDataset -> checkpoint resolve -> forward+decode+NMS -> session loop
-> async JSON writer thread — inference_{standard_yolov3,aleatoric,
epistemic}.py):

* standard / aleatoric: batched forward, per-batch-element NMS (the
  reference builds a tf.while_loop per element, :104-145; here the image
  batch is a grid axis of the fixed-shape NMS kernel — nms.nms_select_batch).
* epistemic (bayesian, inference_mode): batch 1, T-sample ``mc_forward``,
  epistemic reduction, NMS over the flattened 21+C rows.  The T sample
  axis can be sharded over an ``mc`` mesh axis.

The whole device program (forward -> decode -> NMS) is one jit; the JSON
writing overlaps the next batch on a worker thread (parity
inference_epistemic.py:75-92).
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.blueprint import Variant
from ..core.priors import priors_as_array
from ..data import pipeline
from ..models.yolov3 import YoloV3
from ..ops import decode, nms
from ..train.checkpoints import CheckpointStore
from ..train.loop import merge_params, partition_params
from .ecp import bbox_to_ecp_format

log = logging.getLogger("byolo.infer")


class InferenceRunner:
    def __init__(self, config: Config, seed: int = 0):
        assert not config.crop, "inference runs on full images (reference :198)"
        self.config = config
        self.model = YoloV3.from_config(config)
        self.spec = self.model.spec
        self.epistemic = (
            self.spec.variant == Variant.BAYESIAN and config.inference_mode
        )
        # rbg: cheap on-TPU random bits for the MC-dropout masks
        self.rng = jax.random.key(seed, impl="rbg")
        self._priors = priors_as_array(self.model.priors)
        # multi-chip parallelism from config.mesh_shape:
        # * {'sp': N}: image-H (spatial) sharding — activations / device
        #   divide by N, the reference's resolution/OOM axis
        #   (inference_epistemic.py:221, SURVEY §5.7); any variant;
        # * {'mc': N}: the T MC-dropout samples shard over N devices
        #   (SURVEY §2.9's north-star axis); epistemic only;
        # * {'sp': a, 'mc': b}: both composed (epistemic);
        # * {'dp': N}: the image batch shards over N devices, each running
        #   the complete fused single-device pipeline (parallel/batch.py) —
        #   the throughput axis for the batched standard/aleatoric configs;
        #   composes with quantize="int8".
        # Single-device otherwise.
        self.mesh = None
        self.sp_mesh = None
        self.dp_mesh = None
        self._sp_mc_axis = None
        self._mc_fused = None
        self._dp_pipeline = None
        if config.mesh_shape.get("dp", 0) > 1:
            from ..parallel import mesh as mesh_lib
            from ..parallel.batch import make_dp_batched_pipeline

            if self.epistemic:
                raise ValueError(
                    "the dp axis shards the image batch; epistemic "
                    "inference is batch-1 (shard T with {'mc': N} instead)"
                )
            if len(config.mesh_shape) > 1:
                raise ValueError("dp does not compose with sp/mc axes")
            n = config.mesh_shape["dp"]
            if config.batch_size % n != 0:
                raise ValueError(
                    f"batch_size {config.batch_size} must divide over the "
                    f"dp axis ({n})"
                )
            if config.packed_host_input:
                raise ValueError(
                    "packed_host_input is a single-device feed; the dp "
                    "path takes plain NHWC batches"
                )
            self.dp_mesh = mesh_lib.make_mesh({"dp": n})
            self._dp_pipeline = make_dp_batched_pipeline(
                self.model, self.dp_mesh,
                priors_by_stride=self._priors,
                obj_idx=self.spec.obj_idx(epistemic=False),
                nms_max_boxes=config.nms_max_boxes,
                nms_iou_thresh=config.nms_iou_thresh,
                nms_pre_top_k=0,  # multi-chip: exact NMS outright
                use_pallas=config.use_pallas,
                interpret=jax.devices()[0].platform != "tpu",
                standard_test_dropout=config.standard_test_dropout,
            )
        elif config.mesh_shape.get("sp", 0) > 1:
            from ..parallel import mesh as mesh_lib

            shape = {"sp": config.mesh_shape["sp"]}
            if config.mesh_shape.get("mc", 0) > 1:
                assert self.epistemic, "mc axis requires the epistemic runner"
                assert config.T % config.mesh_shape["mc"] == 0, (
                    "T must divide evenly over the mc axis"
                )
                shape["mc"] = config.mesh_shape["mc"]
                self._sp_mc_axis = "mc"
            self.sp_mesh = mesh_lib.make_mesh(shape)
        elif self.epistemic and config.mesh_shape.get("mc", 0) > 1:
            from ..parallel import mesh as mesh_lib

            self.mesh = mesh_lib.make_mesh({"mc": config.mesh_shape["mc"]})
            assert config.T % config.mesh_shape["mc"] == 0, (
                "T must divide evenly over the mc axis"
            )
            if config.use_pallas:
                # multi-chip keeps the Pallas fast path: per-device partial
                # moments + ICI psum + replicated finalize/NMS (shard_map);
                # interpret mode stands in for Mosaic off-TPU (tests/dryrun)
                from ..parallel.epistemic import make_mc_sharded_fused_pipeline

                interpret = jax.devices()[0].platform != "tpu"
                self._mc_fused = make_mc_sharded_fused_pipeline(
                    self.model, self.mesh, T=config.T,
                    priors_by_stride=self._priors,
                    obj_idx=self.spec.obj_idx(epistemic=True),
                    nms_max_boxes=config.nms_max_boxes,
                    nms_iou_thresh=config.nms_iou_thresh,
                    nms_pre_top_k=0,  # multi-chip: exact NMS outright
                    use_pallas_nms=True,
                    interpret=interpret,
                    fixed_masks=config.fixed_mc_masks,
                )
        if config.fixed_mc_masks is not None and (
            self.sp_mesh is not None
            or (self.mesh is not None and self._mc_fused is None)
        ):
            raise ValueError(
                "fixed_mc_masks composes with the single-device epistemic "
                "paths and the mc-sharded FUSED pipeline (use_pallas); the "
                "sp mesh and the GSPMD mc fallback draw per-device keys"
            )
        # int8 head quantization (ops.quant): covers BOTH the T-sample
        # epistemic section and the batched standard/aleatoric heads
        # (the reference's own headline batch-11 config,
        # inference_aleatoric.py:227)
        self._qheads = None
        if config.quantize is not None:
            if config.quantize != "int8":
                raise ValueError(f"unknown quantize mode {config.quantize!r}")
            if self.sp_mesh is not None:
                raise ValueError(
                    "quantize='int8' does not compose with the sp (spatial) "
                    "mesh: the quantized section runs on the gathered head "
                    "inputs, which the sp axis shards"
                )
            if self.mesh is not None and self._mc_fused is None:
                raise ValueError(
                    "quantize='int8' over the mc mesh requires the fused "
                    "shard_map pipeline (config.use_pallas=True); the GSPMD "
                    "fallback cannot partition the quantized section"
                )
        if self._dp_pipeline is not None:
            dp = self._dp_pipeline

            def run_dp(params, stats, images, rng, qh=None):
                imgs = jnp.asarray(images).astype(jnp.float32) / 255.0
                rows, valid = dp(params, stats, imgs, rng, qh)
                # per-device NMS runs exact (pre_top_k=0) outright
                return rows, valid, jnp.ones((rows.shape[0],), jnp.bool_)

            self._jit = run_dp  # jitted inside the shard_map wrapper
        elif self._mc_fused is not None:
            fused = self._mc_fused

            def run_fused(params, stats, images, rng, qh=None):
                imgs = jnp.asarray(images).astype(jnp.float32) / 255.0
                rows, valid = fused(params, stats, imgs, rng, qh)
                # the sharded pipeline runs exact NMS (pre_top_k=0 below)
                return rows, valid, jnp.ones((rows.shape[0],), jnp.bool_)

            self._jit = run_fused  # jitted inside the shard_map wrapper
        else:
            import functools

            self._jit = jax.jit(functools.partial(
                self._device_pipeline, pre_top_k=self.config.nms_pre_top_k
            ))
            # exact-NMS retry program for uncertified batches; compiled
            # lazily on the first certificate failure
            self._jit_exact_fn = None

    # -- checkpoint handling -------------------------------------------

    def load_state(self):
        """Restore params/stats from a training checkpoint ('last' or step,
        parity inference_epistemic.py:27-38)."""
        # read-only use; keep the training retention policy so an
        # accidental save could never garbage-collect old checkpoints
        store = CheckpointStore(
            self.config.checkpoint_path, self.config.run_id,
            max_to_keep=self.config.ckp_max_to_keep,
        )
        params, stats = self.model.init(jax.random.PRNGKey(0))
        trainable, frozen = partition_params(params, self.config.freeze_darknet53)
        like = {
            "params": jax.tree.map(np.asarray, trainable),
            "frozen": jax.tree.map(np.asarray, frozen),
            "stats": jax.tree.map(np.asarray, stats),
        }
        restored, step = store.restore_partial(like, step=self.config.step)
        params = merge_params(restored["params"], restored["frozen"])
        return params, restored["stats"], step

    # -- device program -------------------------------------------------

    def _decode_scales(self, raws, epistemic: bool):
        decoded = []
        for i, (raw, stride) in enumerate(zip(raws, (32, 16, 8))):
            det = decode.split_detection(raw, self.spec)
            pri = jnp.asarray(self._priors[stride])
            if epistemic:
                stats = decode.decode_epistemic_stats(det)
                decoded.append(decode.decode_bbox_epistemic(stats, pri, layer_id=i))
            elif self.spec.aleatoric_head:
                decoded.append(decode.decode_bbox_aleatoric(det, pri, layer_id=i))
            else:
                decoded.append(decode.decode_bbox_standard(det, pri, layer_id=i))
        return decoded

    def _use_fused_kernels(self) -> bool:
        # the fused channels-first kernels are single-device programs;
        # GSPMD cannot spatially partition a pallas_call, so the sp mesh
        # takes the XLA decode path (Pallas NMS still runs, on the
        # replicated post-gather rows)
        return (
            self.config.use_pallas
            and jax.devices()[0].platform == "tpu"
            and self.sp_mesh is None
        )

    def _use_pallas_nms(self) -> bool:
        return self.config.use_pallas and jax.devices()[0].platform == "tpu"

    def _packed_input(self) -> bool:
        """Host-packed s2d CF u8 planes instead of NHWC images
        (config.packed_host_input) — fused single-device paths only."""
        if not self.config.packed_host_input:
            return False
        ok = (
            self._use_fused_kernels()
            and self.mesh is None
            and self._mc_fused is None
            and self.config.full_img_size[0] % 32 == 0
        )
        if not ok:
            raise ValueError(
                "packed_host_input requires the fused single-device "
                "kernel path (use_pallas on TPU, no sp/mc mesh, H % 32 == 0)"
            )
        return True

    def exact_pipeline(self, params, stats, images, rng):
        """Exact-NMS (pre_top_k=0) instance of the device program.

        Compiled lazily on the first NMS-certificate failure: trained-model
        score surfaces certify essentially always (tests/test_nms.py), so
        this usually never compiles; diffuse surfaces (early training,
        random weights) trigger it and get exact results at full cost.
        """
        import functools

        if getattr(self, "_jit_exact_fn", None) is None:
            log.info("NMS certificate failed — compiling exact-NMS retry "
                     "program (one-time)")
            self._jit_exact_fn = jax.jit(functools.partial(
                self._device_pipeline, pre_top_k=0
            ))
        return self._jit_exact_fn(params, stats, images, rng, self._qheads)

    # -- int8 quantization ------------------------------------------------

    def calibrate_int8(self, params, stats, images):
        """Calibrate + build the int8 head section (config.quantize="int8").

        ``images``: representative uint8 NHWC batch (1-4 images suffice —
        max-abs calibration).  Epistemic runners calibrate over the MC
        sample distribution (ops.quant.calibrate_mc_amax); batched
        standard/aleatoric runners over the plain forward
        (calibrate_forward_amax).  ``run()`` calls this automatically on
        the dataset's first ``quant_calib_images`` images; ``predict()``
        users call it once up front.
        """
        from ..ops.quant import (
            calibrate_forward_amax,
            calibrate_mc_amax,
            quantize_heads,
        )

        assert self.config.quantize == "int8", "config.quantize is not set"
        imgs = jnp.asarray(images).astype(jnp.float32) / 255.0
        pct = self.config.quant_calib_percentile
        if self.epistemic:
            amax = calibrate_mc_amax(
                params, stats, imgs, spec=self.spec, T=self.config.T,
                rng=jax.random.PRNGKey(0), compute_dtype=self.model._dtype,
                percentile=pct,
            )
        else:
            amax = calibrate_forward_amax(
                params, stats, imgs, spec=self.spec,
                rng=jax.random.PRNGKey(0),
                compute_dtype=self.model._dtype,
                standard_test_dropout=self.config.standard_test_dropout,
                percentile=pct,
            )
        self._qheads = quantize_heads(params, stats, self.spec, amax)
        log.info("int8 head section calibrated on %d images (%d sites)",
                 imgs.shape[0], len(amax))
        return self._qheads

    def device_batch_size(self) -> int:
        """Largest image batch the compiled device program accepts.

        The epistemic XLA fallback and the mc-sharded path keep the
        reference's batch-1 contract (inference_epistemic.py:49 builds a
        batch-1 graph); the fused anchor-folding path and all
        non-epistemic paths are batched.
        """
        if self.epistemic and (
            self.mesh is not None or not self._use_fused_kernels()
        ):
            return 1
        return self.config.batch_size

    def predict(self, params, stats, images, rng):
        """uint8 NHWC image batch -> (rows, valid) numpy detections.

        Public single-dispatch wrapper over the jitted device program,
        with the exact-NMS certificate retry applied.  ``images`` must be
        plain NHWC uint8 (the packed-planes feed is a ``run()``-loop
        optimization); batch size must not exceed ``device_batch_size()``.
        """
        assert not self.config.packed_host_input, (
            "predict() takes NHWC uint8 images; packed_host_input is a "
            "run()-loop feed"
        )
        if self.config.quantize is not None and self._qheads is None:
            raise RuntimeError(
                "config.quantize is set but the int8 head section is not "
                "calibrated — call calibrate_int8(params, stats, images) "
                "once before predict()"
            )
        images_d = jnp.asarray(images)
        rows, valid, cert = self._jit(params, stats, images_d, rng,
                                      self._qheads)
        if not np.asarray(cert).all():
            rows, valid, _ = self.exact_pipeline(params, stats, images_d, rng)
        return np.asarray(rows), np.asarray(valid)

    def _device_pipeline(self, params, stats, images, rng, qh=None, *,
                         pre_top_k):
        """uint8 batch -> (rows, valid, cert) padded NMS selections.

        ``cert`` is the per-image exactness certificate of the pre-top-k
        NMS restriction (ops.nms); the host loop retries uncertified
        batches through an exact (pre_top_k=0) instance of this program.

        With ``packed_host_input`` the ``images`` arg is the host-packed
        u8 planes (N, 16, L); scaling happens inside the backbone.

        ``qh``: quantized-head pytree (ops.quant) — when given, the head
        section runs int8 (config.quantize="int8"): the T-sample
        epistemic section on epistemic runners, the batched
        standard/aleatoric heads otherwise.
        """
        packed_hw = (tuple(self.config.full_img_size[:2])
                     if self._packed_input() else None)
        imgs = (images if packed_hw is not None
                else images.astype(jnp.float32) / 255.0)
        cfg = self.config
        obj_idx = self.spec.obj_idx(self.epistemic)
        if self.sp_mesh is not None:
            # image-H sharding (GSPMD): activations / device divide by the
            # sp axis size; decode+NMS run on the gathered (replicated)
            # head outputs — they are tiny next to the backbone activations
            from ..parallel import spatial

            if self.epistemic:
                raws = spatial.spatial_mc_raws(
                    params, stats, imgs, rng, spec=self.spec,
                    mesh=self.sp_mesh, T=cfg.T,
                    compute_dtype=self.model._dtype,
                    mc_axis=self._sp_mc_axis,
                )
                decoded = self._decode_scales(raws, epistemic=True)
                flat = decode.concat_all_scales(decoded)
                rows, valid, _, cert = nms.nms_select(
                    flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                    pre_top_k=pre_top_k,
                    use_pallas=self._use_pallas_nms(),
                    with_certificate=True,
                )
                return rows[None], valid[None], cert[None]
            raws = spatial.spatial_forward_raws(
                params, stats, imgs, rng, spec=self.spec, mesh=self.sp_mesh,
                compute_dtype=self.model._dtype,
                standard_test_dropout=cfg.standard_test_dropout,
            )
            decoded = self._decode_scales(raws, epistemic=False)
            flat = decode.concat_all_scales_batched(decoded)
            rows, valid, _, cert = nms.nms_select_batch(
                flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                pre_top_k=pre_top_k,
                use_pallas=self._use_pallas_nms(),
                with_certificate=True,
            )
            return rows, valid, cert
        if self.epistemic:
            if self.mesh is not None:
                # T sharded over the 'mc' mesh axis; the epistemic
                # reduction compiles to an ICI all-reduce (XLA decode path —
                # GSPMD partitions it; the Pallas kernel is single-device)
                from ..parallel.epistemic import make_mc_sharded_forward

                if not hasattr(self, "_mc_sharded"):
                    self._mc_sharded = make_mc_sharded_forward(
                        self.model, self.mesh, T=cfg.T
                    )
                raws = self._mc_sharded(params, stats, imgs, rng)
                decoded = self._decode_scales(raws, epistemic=True)
                flat = decode.concat_all_scales(decoded)
                rows, valid, _, cert = nms.nms_select(
                    flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                    pre_top_k=pre_top_k,
                    use_pallas=self._use_fused_kernels(),
                    with_certificate=True,
                )
                return rows[None], valid[None], cert[None]
            if self._use_fused_kernels():
                # channels-first heads + fused Pallas epistemic decode;
                # image batches > 1 supported (anchor-axis folding) — a
                # framework extension over the reference's batch-1 limit
                from ..models.yolov3 import mc_forward_cf
                from ..ops.pallas_epistemic import fused_epistemic_decode_cf_batched

                nb = imgs.shape[0]  # packed planes are (N, 16, L) — same axis
                if qh is not None:
                    from ..models.quant import mc_forward_cf_q

                    outs = mc_forward_cf_q(
                        qh, params, stats, imgs, spec=self.spec, T=cfg.T,
                        rng=rng, compute_dtype=self.model._dtype,
                        packed_hw=packed_hw, fixed_masks=cfg.fixed_mc_masks,
                    )
                else:
                    outs = mc_forward_cf(
                        params, stats, imgs, spec=self.spec, T=cfg.T, rng=rng,
                        compute_dtype=self.model._dtype, packed_hw=packed_hw,
                        fixed_masks=cfg.fixed_mc_masks,
                    )
                flat = jnp.concatenate(
                    [
                        fused_epistemic_decode_cf_batched(
                            raw_cf, jnp.asarray(self._priors[stride]),
                            n_imgs=nb, h=hw[0], w=hw[1],
                            cls_cnt=self.spec.cls_cnt, layer_id=i,
                        )
                        for i, ((raw_cf, hw), stride) in enumerate(
                            zip(outs, (32, 16, 8))
                        )
                    ],
                    axis=1,
                )  # (nb, N_total, width)

                # batched Pallas NMS: images are a kernel grid axis (the
                # kernel is not vmappable — SMEM outputs)
                rows, valid, _, cert = nms.nms_select_batch(
                    flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                    pre_top_k=pre_top_k,
                    use_pallas=self._use_fused_kernels(),
                    with_certificate=True,
                )
                return rows, valid, cert
            if qh is not None:
                # quantized forward emits channels-first raws; relayout to
                # the (T, h, w, ch) the XLA decode expects (CPU/test path —
                # on TPU quantize rides the fused branch above)
                from ..models.quant import mc_forward_cf_q

                outs = mc_forward_cf_q(
                    qh, params, stats, imgs, spec=self.spec, T=cfg.T,
                    rng=rng, compute_dtype=self.model._dtype,
                    fixed_masks=cfg.fixed_mc_masks,
                )
                raws = [
                    raw_cf.reshape(raw_cf.shape[0], cfg.T, h, w)
                    .transpose(1, 2, 3, 0)
                    for raw_cf, (h, w) in outs
                ]
            else:
                raws = self.model.mc_forward(params, stats, imgs, T=cfg.T,
                                             rng=rng,
                                             fixed_masks=cfg.fixed_mc_masks)
            decoded = self._decode_scales(raws, epistemic=True)
            flat = decode.concat_all_scales(decoded)
            rows, valid, _, cert = nms.nms_select(
                flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                pre_top_k=pre_top_k,
                use_pallas=self._use_fused_kernels(),
                with_certificate=True,
            )
            return rows[None], valid[None], cert[None]
        if self._use_fused_kernels():
            from ..models.yolov3 import forward_cf
            from ..ops.pallas_decode import fused_box_decode_all_scales

            if qh is not None:
                from ..models.quant import forward_cf_q

                outs = forward_cf_q(
                    qh, params, stats, imgs, spec=self.spec, rng=rng,
                    standard_test_dropout=self.config.standard_test_dropout,
                    compute_dtype=self.model._dtype, packed_hw=packed_hw,
                )
            else:
                outs = forward_cf(
                    params, stats, imgs, spec=self.spec, rng=rng,
                    standard_test_dropout=self.config.standard_test_dropout,
                    compute_dtype=self.model._dtype, packed_hw=packed_hw,
                )
            flat = fused_box_decode_all_scales(
                outs, self._priors, spec=self.spec
            )  # (batch, N_total, width), reference concat order

            rows, valid, _, cert = nms.nms_select_batch(
                flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
                pre_top_k=pre_top_k,
                use_pallas=self._use_fused_kernels(),
                with_certificate=True,
            )
            return rows, valid, cert

        if qh is not None:
            # quantized batched forward emits channels-first raws; relayout
            # to (N, h, w, ch) for the XLA decode (CPU/test path — on TPU
            # quantize rides the fused branch above)
            from ..models.quant import forward_cf_q

            outs = forward_cf_q(
                qh, params, stats, imgs, spec=self.spec, rng=rng,
                standard_test_dropout=self.config.standard_test_dropout,
                compute_dtype=self.model._dtype,
            )
            raws = [
                raw_cf.reshape(raw_cf.shape[0], imgs.shape[0], h, w)
                .transpose(1, 2, 3, 0)
                for raw_cf, (h, w) in outs
            ]
        else:
            raws, _ = self.model.forward(
                params, stats, imgs, training=False, rng=rng,
                standard_test_dropout=self.config.standard_test_dropout,
            )
        decoded = self._decode_scales(raws, epistemic=False)
        flat = decode.concat_all_scales_batched(decoded)
        rows, valid, _, cert = nms.nms_select_batch(
            flat, obj_idx, cfg.nms_max_boxes, cfg.nms_iou_thresh,
            pre_top_k=pre_top_k,
            use_pallas=self._use_fused_kernels(),
            with_certificate=True,
        )
        return rows, valid, cert

    # -- host loop -------------------------------------------------------

    def run(self, out_path: Optional[str] = None) -> str:
        cfg = self.config
        params, stats, step = self.load_state()
        out_dir = f"{out_path or cfg.out_path}_{step}"
        os.makedirs(out_dir)  # parity: refuses to overwrite (:43)

        # epistemic batches > 1 need the fused anchor-folding path; the XLA
        # fallback and the mc-sharded path keep the reference's batch-1
        # contract
        batch_size = self.device_batch_size()
        packed = self._packed_input()
        if cfg.quantize is not None and self._qheads is None:
            # calibrate the int8 head section on the dataset's first images
            # (a separate one-epoch loader; the main loop re-reads them and
            # they are processed quantized like every other image)
            calib = []
            calib_loader = pipeline.TestLoader(cfg, batch_size=1)
            for b in calib_loader.batches():
                calib.append(b["image"][0])
                if len(calib) >= cfg.quant_calib_images:
                    break
            self.calibrate_int8(params, stats, np.stack(calib))
        loader = pipeline.TestLoader(cfg, batch_size=batch_size,
                                     pack_planes=packed)
        worker: Optional[threading.Thread] = None
        n = 0
        retried = 0
        start = time.time()
        inflight = None  # (device rows/valid/cert, images, key, bsz, names)

        def exact_rerun(images, key):
            nonlocal retried
            retried += 1
            return self.exact_pipeline(params, stats, images, key)

        def drain(entry):
            nonlocal worker
            rows_d, valid_d, cert_d, images_d, key, bsz, names = entry
            cert = np.asarray(cert_d)
            if not cert.all():
                rows_d, valid_d, _ = exact_rerun(images_d, key)
            rows = np.asarray(rows_d)[:bsz]
            valid = np.asarray(valid_d)[:bsz]
            if worker:
                worker.join()
            worker = threading.Thread(
                target=self._write_batch, args=(rows, valid, names, out_dir)
            )
            worker.start()

        for batch in loader.batches():
            bsz = batch["image"].shape[0]
            images = batch["packed"] if packed else batch["image"]
            if bsz < batch_size:  # pad final partial batch (static shapes)
                pad = np.repeat(images[-1:], batch_size - bsz, axis=0)
                images = np.concatenate([images, pad], axis=0)
            key = jax.random.fold_in(self.rng, n)
            # double-buffer: dispatch this batch BEFORE fetching the
            # previous one, hiding the device->host round-trip latency
            images_d = jnp.asarray(images)
            rows_d, valid_d, cert_d = self._jit(params, stats, images_d, key,
                                                self._qheads)
            names = [f.decode() if isinstance(f, bytes) else f for f in batch["filename"]]
            if inflight is not None:
                drain(inflight)
            inflight = (rows_d, valid_d, cert_d, images_d, key, bsz, names)
            n += bsz
            if n % 15 == 0:
                log.info("Processed %d images.", n)
        if inflight is not None:
            drain(inflight)
        if retried:
            log.info("%d batches re-run with exact NMS (certificate).", retried)
        if worker:
            worker.join()
        elapsed = time.time() - start
        log.info("Processed %d images in %.1fs (%.2f img/s).", n, elapsed,
                 n / max(elapsed, 1e-9))
        return out_dir

    def _write_batch(self, rows, valid, names, out_dir):
        for b in range(rows.shape[0]):
            dets = [
                bbox_to_ecp_format(
                    rows[b, i],
                    self.config.full_img_size,
                    self.spec,
                    epistemic=self.epistemic,
                    implicit_background_class=self.config.implicit_background_class,
                )
                for i in np.flatnonzero(valid[b])
            ]
            base = os.path.splitext(os.path.basename(names[b]))[0]
            with open(os.path.join(out_dir, f"{base}.json"), "w") as f:
                json.dump({"children": dets}, f)
