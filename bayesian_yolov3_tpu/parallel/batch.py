"""Data-parallel batched inference over a device mesh (axis ``dp``).

The reference serves its batched configs (standard/aleatoric batch-11,
inference_aleatoric.py:227) on a single GPU; scaling is "run more
processes".  Here the image batch becomes a first-class mesh axis: with
``Config.mesh_shape = {'dp': N}`` each device runs the COMPLETE fused
single-device pipeline — bf16 (or int8) forward, fused Pallas box
decode, image-vectorized Pallas NMS — on its batch/N local images.
shard_map keeps the Pallas kernels on the fast path (GSPMD cannot
partition a pallas_call); there are no collectives at all: batched
inference is embarrassingly parallel over images, so the axis scales at
ICI-free, near-linear efficiency and the per-device program is byte-for-
byte the proven single-device one.

This is the third serving axis next to ``sp`` (image-H, resolution/OOM,
parallel/spatial.py) and ``mc`` (MC samples, parallel/epistemic.py);
``dp`` is the throughput axis for the non-epistemic production configs.

No reference counterpart (single-GPU, one-process serving); framework
extension.  Sharded-vs-single-device parity: tests/test_dp_batched.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import yolov3 as yolo_lib


def make_dp_batched_pipeline(
    model,
    mesh: Mesh,
    *,
    priors_by_stride,
    obj_idx: int,
    nms_max_boxes: int = 1000,
    nms_iou_thresh: float = 0.5,
    nms_pre_top_k: int = 0,
    use_pallas: bool = True,
    interpret: bool = False,
    standard_test_dropout: bool = False,
    axis: str = "dp",
):
    """Build ``fn(params, stats, imgs (N,H,W,3) f32, rng, qh=None) ->
    (rows (N, max_out, width), valid (N, max_out))`` with the image batch
    sharded over ``axis``.

    Per device: forward_cf (or forward_cf_q when a quantized-head pytree
    ``qh`` is passed) -> fused channels-first box decode -> batched
    Pallas NMS on the local batch/N images.  Params/stats/qh replicated;
    images and outputs sharded on the batch axis; zero collectives.

    ``rng`` seeds the bayesian variant's inference dropout when the spec
    asks for it (dropout keys are folded with the device index so every
    image still sees independent noise); pass None otherwise.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops import decode as decode_ops
    from ..ops import nms as nms_lib
    from ..ops.pallas_decode import fused_box_decode_all_scales

    n = mesh.shape[axis]
    spec = model.spec
    dtype = model._dtype
    dropout_active = spec.mc_dropout and not standard_test_dropout
    impl_box = {}  # key impl captured at first call (rbg in production)

    def shard_fn(params, stats, imgs, keydata, qh):
        # fold the device's mesh position into the dropout key so the
        # sharded batch draws independent noise per device
        if dropout_active:
            key = jax.random.wrap_key_data(keydata, impl=impl_box["impl"])
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        else:
            key = None
        if qh is not None:
            from ..models.quant import forward_cf_q

            outs = forward_cf_q(
                qh, params, stats, imgs, spec=spec, rng=key,
                standard_test_dropout=standard_test_dropout,
                compute_dtype=jnp.float32 if interpret else dtype,
            )
        else:
            outs = yolo_lib.forward_cf(
                params, stats, imgs, spec=spec, rng=key,
                standard_test_dropout=standard_test_dropout,
                compute_dtype=jnp.float32 if interpret else dtype,
                # the fused early-backbone Pallas chain is gated to the
                # real-TPU backend internally; off-TPU tests take XLA
            )
        if use_pallas:
            flat = fused_box_decode_all_scales(
                outs, priors_by_stride, spec=spec, interpret=interpret
            )  # (local_batch, N_total, width)
        else:
            # use_pallas=False (the kernel-bisection escape hatch every
            # other path honors): relayout the cf raws to NHWC and run
            # the XLA decode twin
            raws = [
                raw_cf.reshape(raw_cf.shape[0], imgs.shape[0], hw[0], hw[1])
                .transpose(1, 2, 3, 0)
                for raw_cf, hw in outs
            ]
            decoded = []
            for i, (raw, stride) in enumerate(zip(raws, (32, 16, 8))):
                det = decode_ops.split_detection(raw, spec)
                pri = jnp.asarray(priors_by_stride[stride])
                decoded.append(
                    decode_ops.decode_bbox_aleatoric(det, pri, layer_id=i)
                    if spec.aleatoric_head
                    else decode_ops.decode_bbox_standard(det, pri, layer_id=i)
                )
            flat = decode_ops.concat_all_scales_batched(decoded)
        rows, valid, _ = nms_lib.nms_select_batch(
            flat, obj_idx, nms_max_boxes, nms_iou_thresh,
            pre_top_k=nms_pre_top_k, use_pallas=use_pallas,
            interpret=interpret,
        )
        return rows, valid

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_rep=False,
    )
    jitted = jax.jit(sharded)

    def call(params, stats, imgs, rng, qh=None):
        assert imgs.shape[0] % n == 0, (
            f"batch {imgs.shape[0]} must divide over the dp axis ({n})"
        )
        if dropout_active:
            impl = jax.random.key_impl(rng)
            impl_box.setdefault("impl", impl)
            assert impl_box["impl"] == impl, (
                "key impl must not change across calls")
            keydata = jax.random.key_data(rng)
        else:
            keydata = jnp.zeros((2,), jnp.uint32)
        imgs = jax.device_put(imgs, NamedSharding(mesh, P(axis)))
        return jitted(params, stats, imgs, keydata, qh)

    return call
