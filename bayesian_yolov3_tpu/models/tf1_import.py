"""Import reference TF-1.x training checkpoints into our parameter pytrees.

The reference trains with ``tf.train.Saver`` (lib_yolo/train.py:93), so a
user migrating from it owns name-based TF1 checkpoints.  This module maps
those variable names onto our flat-name pytrees so existing trained models
load directly — no TF session, no graph rebuild.

Variable-name layout of the reference graph (derived from its builders):

* ``ModelBuilder`` wraps every conv in ``tf.variable_scope(None,
  default_name='conv')`` — or ``'downsample'`` for stride-2 backbone convs —
  so scopes uniquify per parent scope as ``conv, conv_1, conv_2, ...``
  (lib_yolo/model.py:43-74).  Parent scopes are ``darknet53`` and
  ``det_net_{1,2,3}`` (lib_yolo/yolov3.py:240-304).
* Inside each scope, ``tf.layers.conv2d(use_bias=False)`` creates
  ``<scope>/conv2d/kernel`` (lib_yolo/layers.py:545-554) and
  ``tf.layers.batch_normalization`` creates
  ``<scope>/batch_normalization/{gamma,beta,moving_mean,moving_variance}``
  (lib_yolo/layers.py:510-518).
* Detection heads are ``det_net_k/detection/conv2d/{kernel,bias}``
  (lib_yolo/model.py:110-163, lib_yolo/layers.py:600-613; bias on).
* Dropout / route / upsample / stack_feature_map scopes hold no variables,
  so all three variants (standard / aleatoric / bayesian) share this layout
  — which is also why the reference's pretrain -> uncertainty warm start
  works (SURVEY §5.4).

TF kernels are (kh, kw, cin, cout) — the same layout we use — so the import
is a pure rename plus shape check.

TensorFlow is imported lazily and ONLY to read the checkpoint file format
(``tf.train.load_checkpoint``); it never touches the compute path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from . import darknet

# leaf maps: tf variable suffix -> (pytree, leaf key)
_CONV_LEAVES = (
    ("conv2d/kernel", "params", "w"),
    ("batch_normalization/gamma", "params", "gamma"),
    ("batch_normalization/beta", "params", "beta"),
    ("batch_normalization/moving_mean", "stats", "mean"),
    ("batch_normalization/moving_variance", "stats", "var"),
)
_DET_LEAVES = (("conv2d/kernel", "params", "w"), ("conv2d/bias", "params", "b"))


def _uniquified(default_name: str, i: int) -> str:
    """TF variable_scope(None, default_name=...) uniquification order."""
    return default_name if i == 0 else f"{default_name}_{i}"


def tf1_variable_map() -> Dict[str, Tuple[str, str, str]]:
    """Full map: tf1 variable name -> (tree, flat block name, leaf key).

    ``tree`` is ``"params"`` or ``"stats"``; the flat block name is a key of
    our pytrees (``backbone`` blocks are nested one level deeper and are
    returned as ``backbone/<conv_name>``).
    """
    mapping: Dict[str, Tuple[str, str, str]] = {}

    def add_conv(scope: str, flat: str):
        for suffix, tree, leaf in _CONV_LEAVES:
            mapping[f"{scope}/{suffix}"] = (tree, flat, leaf)

    # backbone: 'conv' and 'downsample' uniquify independently
    conv_i = ds_i = 0
    for i, (_, _, stride) in enumerate(darknet.DARKNET53_CONV_SPECS):
        if stride == 2:
            scope = _uniquified("downsample", ds_i)
            ds_i += 1
        else:
            scope = _uniquified("conv", conv_i)
            conv_i += 1
        add_conv(f"darknet53/{scope}", f"backbone/{darknet._conv_name(i)}")

    # det heads: heads 2/3 start with the 1x1 transition conv of the
    # PREVIOUS head's branch (reference det_net_2/conv, yolov3.py:265)
    for head in (1, 2, 3):
        prefix = f"det_net_{head}"
        idx = 0
        if head in (2, 3):
            add_conv(f"{prefix}/{_uniquified('conv', idx)}", f"trans{head - 1}")
            idx += 1
        for j in range(6):
            add_conv(f"{prefix}/{_uniquified('conv', idx)}", f"head{head}_conv{j}")
            idx += 1
        for suffix, tree, leaf in _DET_LEAVES:
            mapping[f"{prefix}/detection/{suffix}"] = ("params", f"det{head}", leaf)
    return mapping


def _resolve(tree: Dict, flat: str):
    node = tree
    for part in flat.split("/"):
        node = node[part]
    return node


def _assign(tree: Dict, flat: str, leaf: str, value):
    _resolve(tree, flat)[leaf] = value


_SKIP_SUBSTRINGS = ("/Adam", "beta1_power", "beta2_power", "global_step",
                    "optimizer/")


def load_tf1_checkpoint(ckpt_path: str, params: Dict, stats: Dict):
    """Load a reference TF1 checkpoint into copies of (params, stats).

    ``params``/``stats`` are templates from ``YoloV3.init`` (shapes/keys are
    validated against the checkpoint).  Optimizer slots (Adam moments,
    beta powers, global step) are skipped; every other model variable must
    be consumed and every mapped variable must exist — mirroring the
    darknet importer's full-consumption contract (lib_yolo/darknet.py:66).
    """
    import tensorflow as tf  # lazy: checkpoint file format only

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    mapping = tf1_variable_map()

    params = {
        k: ({kk: dict(vv) for kk, vv in v.items()} if k == "backbone" else dict(v))
        for k, v in params.items()
    }
    stats = {
        k: ({kk: dict(vv) for kk, vv in v.items()} if k == "backbone" else dict(v))
        for k, v in stats.items()
    }
    trees = {"params": params, "stats": stats}

    seen = set()
    for name in shape_map:
        if any(s in name for s in _SKIP_SUBSTRINGS):
            continue
        if name not in mapping:
            raise KeyError(
                f"unmapped reference variable {name!r} — not a known model "
                "variable or optimizer slot"
            )
        tree, flat, leaf = mapping[name]
        want = np.asarray(_resolve(trees[tree], flat)[leaf])
        got = reader.get_tensor(name)
        if tuple(got.shape) != want.shape:
            raise ValueError(
                f"{name!r}: checkpoint shape {tuple(got.shape)} != model "
                f"shape {want.shape} (wrong variant or image size?)"
            )
        _assign(trees[tree], flat, leaf, got.astype(np.float32))
        seen.add(name)

    missing = sorted(set(mapping) - seen)
    if missing:
        raise KeyError(f"checkpoint is missing {len(missing)} model variables, "
                       f"e.g. {missing[:3]}")
    return params, stats


def save_tf1_checkpoint(ckpt_prefix: str, params: Dict, stats: Dict,
                        global_step: int = 0) -> str:
    """Export our pytrees as a reference-compatible TF1 checkpoint.

    The inverse migration: models trained here load back into the
    reference's own graphs via ``tf.train.Saver().restore`` (validated
    against the actual reference code in tests/test_tf1_import.py).
    Written with the eager ``tf.raw_ops.SaveV2`` — no graph or session —
    under the exact variable names the reference's builders create, plus
    the ``checkpoint`` state file that ``tf.train.latest_checkpoint`` and
    the reference's step-suffix convention expect
    (lib_yolo/train.py:97-102).

    Scope: model variables only (the reference's inference and
    warm-start paths); resuming the reference's Adam mid-run would
    additionally need optimizer slots, which have no counterpart here
    (optax state is structured, not name-addressed).
    """
    import os

    import tensorflow as tf  # lazy: checkpoint file format only

    mapping = tf1_variable_map()
    trees = {"params": params, "stats": stats}
    names, tensors = [], []
    for tf_name in sorted(mapping):
        tree, flat, leaf = mapping[tf_name]
        arr = np.asarray(_resolve(trees[tree], flat)[leaf], np.float32)
        names.append(tf_name)
        tensors.append(tf.constant(arr))
    prefix = f"{ckpt_prefix}-{global_step}"
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    tf.raw_ops.SaveV2(prefix=prefix, tensor_names=names,
                      shape_and_slices=[""] * len(names), tensors=tensors)
    base = os.path.basename(prefix)
    with open(os.path.join(os.path.dirname(prefix), "checkpoint"), "w") as f:
        f.write(f'model_checkpoint_path: "{base}"\n'
                f'all_model_checkpoint_paths: "{base}"\n')
    return prefix
