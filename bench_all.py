#!/usr/bin/env python
"""Detailed multi-config benchmark (bench.py stays the one-line headline).

Measures the BASELINE.json config list on the current device and writes
BENCH_DETAIL.json:
  * epistemic inference T=30, batch 1 (headline)
  * aleatoric batched inference (reference batch 11)
  * standard batched inference
  * training step at the reference pretrain config
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FULL = (1024, 1920, 3)


def _pipe_time(dispatch, iters=8, depth=2):
    infl = collections.deque()
    t0 = time.time()
    for i in range(iters):
        infl.append(dispatch(i))
        if len(infl) >= depth:
            int(infl.popleft())
    while infl:
        int(infl.popleft())
    return (time.time() - t0) / iters


def bench_epistemic():
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, mc_forward_cf
    from bayesian_yolov3_tpu.ops import decode, nms
    from bayesian_yolov3_tpu.ops.pallas_epistemic import fused_epistemic_decode_cf

    cfg = Config(model="bayesian", full_img_size=FULL, T=30, inference_mode=True)
    m = YoloV3.from_config(cfg)
    pri = priors_as_array(m.priors)
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, *FULL)), jnp.float32)

    def fn(p, s, x, k):
        outs = mc_forward_cf(p, s, x, spec=m.spec, T=30, rng=k, compute_dtype=m._dtype)
        decoded = [
            fused_epistemic_decode_cf(r, jnp.asarray(pri[st]), h=hw[0], w=hw[1],
                                      cls_cnt=2, layer_id=i)
            for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
        ]
        flat = decode.concat_all_scales(decoded)
        return nms.nms_select(flat, 14, 1000, 0.5, pre_top_k=8192, use_pallas=True)[2]

    j = jax.jit(fn)
    key = jax.random.key(1, impl="rbg")
    for i in range(3):
        int(j(params, stats, img, jax.random.fold_in(key, i)))
    dt = _pipe_time(lambda i: j(params, stats, img, jax.random.fold_in(key, 100 + i)))
    return {"img_per_sec": 1.0 / dt, "ms_per_img": dt * 1000}


def bench_batched(model, nb):
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.core.priors import priors_as_array
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3, forward_cf
    from bayesian_yolov3_tpu.ops import nms
    from bayesian_yolov3_tpu.ops.pallas_decode import fused_box_decode_cf

    cfg = Config(model=model, full_img_size=FULL)
    m = YoloV3.from_config(cfg)
    pri = priors_as_array(m.priors)
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (nb, *FULL)), jnp.float32)
    obj_idx = m.spec.obj_idx(False)

    def fn(p, s, x):
        outs = forward_cf(p, s, x, spec=m.spec, compute_dtype=m._dtype)
        flat = jnp.concatenate(
            [
                fused_box_decode_cf(r, jnp.asarray(pri[st]), h=hw[0], w=hw[1],
                                    cls_cnt=2, layer_id=i,
                                    aleatoric=m.spec.aleatoric_head)
                for i, ((r, hw), st) in enumerate(zip(outs, (32, 16, 8)))
            ],
            axis=1,
        )
        return jnp.sum(jax.vmap(
            lambda fl: nms.nms_select(fl, obj_idx, 1000, 0.5, pre_top_k=8192)[2]
        )(flat))

    j = jax.jit(fn)
    int(j(params, stats, img))
    dt = _pipe_time(lambda i: j(params, stats, img), iters=5)
    return {"img_per_sec": nb / dt, "ms_per_img": dt * 1000 / nb, "batch": nb}


def bench_train():
    import jax, jax.numpy as jnp
    from bayesian_yolov3_tpu.config import Config
    from bayesian_yolov3_tpu.data import encode
    from bayesian_yolov3_tpu.models.yolov3 import YoloV3
    from bayesian_yolov3_tpu.train import loop as L

    cfg = Config(model="aleatoric", crop=True, full_img_size=FULL,
                 crop_img_size=(768, 1440, 3), batch_size=8, max_boxes_per_img=60,
                 darknet53_weights="")
    m = YoloV3.from_config(cfg)
    tables = encode.build_prior_tables(m.blueprint)
    step_fn, _, opt = L.make_train_step(m, cfg, tables)
    state = L.init_state(m, cfg, jax.random.PRNGKey(0), opt)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 255, (8, *FULL), dtype=np.uint8)),
        "bbox": jnp.asarray(np.tile(np.asarray([[0.2, 0.2, 0.6, 0.5]], np.float32), (8, 60, 1))),
        "label": jnp.ones((8, 60), jnp.int32),
        "valid": jnp.ones((8, 60), bool),
    }
    j = jax.jit(step_fn, donate_argnums=(0,))
    key = jax.random.key(0, impl="rbg")
    state, metrics = j(state, batch, key)
    float(metrics["total"])
    t0 = time.time()
    iters = 8
    for _ in range(iters):
        state, metrics = j(state, batch, key)
        float(metrics["total"])
    dt = (time.time() - t0) / iters
    return {"ms_per_step": dt * 1000, "img_per_sec": 8 / dt,
            "config": "aleatoric crop 768x1440 batch 8 frozen backbone"}


def main():
    results = {"epistemic_T30_batch1": bench_epistemic()}
    results["aleatoric_batch11"] = bench_batched("aleatoric", 11)
    results["standard_batch11"] = bench_batched("standard", 11)
    results["train_step"] = bench_train()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
