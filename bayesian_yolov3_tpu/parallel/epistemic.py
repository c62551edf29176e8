"""MC-sample-parallel epistemic inference over a device mesh.

The reference's one real parallel axis is the T MC-dropout samples, batched
on a single GPU via feature-map stacking (SURVEY §2.9).  Here T becomes a
sharded vmap axis, two ways:

* ``make_mc_sharded_forward`` — GSPMD path: per-sample PRNG keys are placed
  sharded over the ``mc`` mesh axis and a sharding constraint on the
  per-sample head outputs makes GSPMD partition the whole dropout-bearing
  head computation across chips; the epistemic reduction compiles to an ICI
  all-reduce.  Composable with any downstream XLA decode, but NOT with the
  fused Pallas kernels (GSPMD cannot partition a pallas_call).
* ``make_mc_sharded_fused_pipeline`` — shard_map path, the fast one: each
  device runs the heads on its T/N local samples and the Pallas
  partial-moments kernel (ops.pallas_epistemic.epistemic_moments_cf), the
  moment sums all-reduce over ICI (one (B, 21+C, hw) f32 tensor per scale —
  tiny next to the raw samples), and the finalize + NMS kernels run
  replicated.  Multi-chip keeps the single-chip Pallas fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import yolov3 as yolo_lib
from ..models import darknet


def make_mc_sharded_forward(model, mesh: Mesh, T: int, axis: str = "mc"):
    """Build a jitted fn(params, stats, img, rng) -> [raw1, raw2, raw3]
    with the T sample axis sharded over ``axis`` of ``mesh``.

    T must be divisible by the axis size.  Outputs have shape (T, h, w, ch).
    """
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} not divisible by mc axis size {n}"
    sample_sharding = NamedSharding(mesh, P(axis))
    spec = model.spec
    dtype = model._dtype

    def fn(params, stats, img, keys):
        out32, skip16, skip8, _ = darknet.darknet53(
            params["backbone"], stats["backbone"], img,
            training=False, compute_dtype=dtype,
        )

        def one_sample(key):
            raws, _ = yolo_lib._heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True, rng=key,
                compute_dtype=dtype,
            )
            return tuple(r[0] for r in raws)

        raws = jax.vmap(one_sample)(keys)
        return [jax.lax.with_sharding_constraint(r, sample_sharding) for r in raws]

    jitted = jax.jit(fn)

    def call(params, stats, img, rng):
        keys = jax.device_put(jax.random.split(rng, T), sample_sharding)
        return jitted(params, stats, img, keys)

    return call


def make_mc_sharded_fused_pipeline(
    model,
    mesh: Mesh,
    T: int,
    *,
    priors_by_stride,
    obj_idx: int,
    nms_max_boxes: int = 1000,
    nms_iou_thresh: float = 0.5,
    nms_pre_top_k: int = 0,
    use_pallas_nms: bool = True,
    interpret: bool = False,
    axis: str = "mc",
    fixed_masks=None,
):
    """Fused multi-chip epistemic pipeline (the north-star configuration).

    Returns a jitted ``fn(params, stats, img(1,H,W,3) f32, rng) -> (rows
    (1, max_out, 21+C), valid (1, max_out))`` where the T MC samples are
    sharded over ``axis`` and the Pallas decode stays on the fast path:

      per device:  backbone (replicated) -> heads on T/N local sample keys
                   -> channels-first 1x1 head -> Pallas partial moments
      collective:  lax.psum of the (B, 21+C, hw) moment sums over ``axis``
      replicated:  Pallas finalize (means/cov/entropy/corner decode)
                   -> concat scales -> NMS

    The psum moves ~(21+C) f32 rows per anchor instead of chpp*T raw
    samples, so ICI traffic is independent of T.

    PRNG note: with the production rbg impl, random bits depend on the vmap
    batch layout, so sharding T changes the (equally valid) dropout masks —
    MC statistics are unaffected.  Threefry keys are layout-invariant and
    make the sharded path bit-identical to single-device (tested in
    tests/test_mc_sharded.py).

    ``fixed_masks`` (int seed or None): deterministic serving over the
    mesh — the SAME constant (T, 15) per-(sample, site) key table as the
    single-device paths (yolov3._fixed_key_table), sharded over ``axis``
    so each device draws its global samples' masks; mask bits are
    IDENTICAL to the single-device fixed-mask run at the same seed/T
    regardless of mesh shape.  ``rng`` is ignored when set.

    ``qh`` (call-time arg, quantized-head pytree from ops.quant or None):
    the int8 head section (models.quant._heads_q) runs per device on its
    local samples — multi-chip keeps the measured 1.57x int8 section win
    (BENCH_NOTES round 4); the psum'd moments are f32 either way.
    """
    from jax.experimental.shard_map import shard_map

    from ..ops import nms as nms_lib
    from ..ops.common import detection_conv_cf
    from ..ops.pallas_epistemic import epistemic_finalize, epistemic_moments_cf
    from ..ops.quant import quant_detection_cf, quantize_act

    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} not divisible by mc axis size {n}"
    spec = model.spec
    dtype = model._dtype
    C = spec.cls_cnt

    impl_box = {}  # key impl captured at first call (rbg in production)

    def shard_fn(params, stats, img, keydata, qh):
        # keydata: (T/n, 15) u32 fixed-mask table rows, or (T/n, words)
        # packed PRNG key data — selected at build time by fixed_masks
        out32, skip16, skip8, _ = darknet.darknet53(
            params["backbone"], stats["backbone"], img,
            training=False, compute_dtype=dtype,
        )

        if qh is not None:
            from ..models.quant import _heads_q

            entry = qh["entry"]
            q32 = quantize_act(out32, entry["out32"])
            qs16 = quantize_act(skip16, entry["skip16"])
            qs8 = quantize_act(skip8, entry["skip8"])

        # one sample-fn over the per-sample arg (a fixed-mask u32 key row
        # or a wrapped PRNG key), vmapped over the device's T/n rows
        def one_sample(sample_arg):
            key, site_keys = ((None, sample_arg) if fixed_masks is not None
                              else (sample_arg, None))
            if qh is not None:
                return _heads_q(qh, q32, qs16, qs8, rng=key,
                                fixed_site_keys=site_keys)
            feats, _ = yolo_lib._heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True,
                rng=key, fixed_site_keys=site_keys,
                compute_dtype=dtype, return_features=True,
            )
            return feats

        sample_arg = (keydata if fixed_masks is not None else
                      jax.random.wrap_key_data(keydata,
                                               impl=impl_box["impl"]))
        feats = jax.vmap(one_sample)(sample_arg)  # 3 x (T/n, 1, h, w, cf)
        decoded = []
        for i, (f, stride) in enumerate(zip(feats, (32, 16, 8))):
            h, w = f.shape[2], f.shape[3]
            if qh is not None:
                raw_cf = quant_detection_cf(qh[f"det{i + 1}"], f)
            else:
                # interpret (= off-TPU) runs the 1x1 head contraction in
                # f32: XLA:CPU has no bf16 dot thunk (BF16xBF16=F32)
                raw_cf = detection_conv_cf(
                    params[f"det{i + 1}"], f,
                    compute_dtype=jnp.float32 if interpret else dtype,
                )  # (ch, T/n, hw)
            moments = epistemic_moments_cf(
                raw_cf, cls_cnt=C, interpret=interpret
            )
            moments = jax.lax.psum(moments, axis)  # global sums, replicated
            decoded.append(
                epistemic_finalize(
                    moments, jnp.asarray(priors_by_stride[stride]),
                    T=T, h=h, w=w, cls_cnt=C, layer_id=i,
                    interpret=interpret,
                )[0]
            )  # (B*hw, width)
        flat = jnp.concatenate(decoded, axis=0)
        rows, valid, _ = nms_lib.nms_select(
            flat, obj_idx, nms_max_boxes, nms_iou_thresh,
            pre_top_k=nms_pre_top_k, use_pallas=use_pallas_nms,
            interpret=interpret,
        )
        return rows[None], valid[None]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    jitted = jax.jit(sharded)

    def call(params, stats, img, rng, qh=None):
        if fixed_masks is not None:
            keydata = yolo_lib._fixed_key_table(fixed_masks, T)  # (T, 15) u32
        else:
            impl = jax.random.key_impl(rng)
            impl_box.setdefault("impl", impl)
            assert impl_box["impl"] == impl, (
                "key impl must not change across calls")
            keydata = jax.random.key_data(jax.random.split(rng, T))
        keydata = jax.device_put(keydata, NamedSharding(mesh, P(axis)))
        return jitted(params, stats, img, keydata, qh)

    return call
