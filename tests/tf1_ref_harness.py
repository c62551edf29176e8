"""Subprocess harness: build the ACTUAL reference TF1 graph and snapshot it.

Run as ``python tf1_ref_harness.py <variant> <out_dir> <h> <w>``.  Imports
the reference package from /root/reference (read-only, used purely as a
golden oracle), builds its graph under a tf.compat.v1 shim, assigns random
well-scaled weights, saves a genuine TF1 ``Saver`` checkpoint (the artifact
a reference user owns, lib_yolo/train.py:93), and dumps the forward outputs
on a fixed image to ``golden.npz``.

Runs in a subprocess because ``disable_eager_execution`` is process-global
and would break the eager TF oracles used by other tests.

TF 2.21 removed ``tf.compat.v1.layers``, so the four layer functions the
reference uses (conv2d / batch_normalization / dropout / flatten) are
re-provided here on ``tf.nn`` primitives with the exact TF1 variable-name
behavior (scope ``conv2d/kernel``, ``batch_normalization/{gamma,beta,
moving_mean,moving_variance}``) — this is test scaffolding, not framework
code.
"""

import json
import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def make_tf1_shim():
    import tensorflow as real_tf

    v1 = real_tf.compat.v1
    v1.disable_eager_execution()

    layers = types.ModuleType("tensorflow.layers")

    def conv2d(inputs, filters, kernel_size, strides=1, activation=None,
               padding="SAME", use_bias=True, trainable=True,
               kernel_regularizer=None, bias_regularizer=None):
        assert activation is None
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(strides, int):
            strides = (strides, strides)
        cin = int(inputs.shape[-1])
        with v1.variable_scope(None, default_name="conv2d"):
            kernel = v1.get_variable(
                "kernel", [*kernel_size, cin, filters], dtype=v1.float32,
                trainable=trainable,
            )
            y = v1.nn.conv2d(inputs, kernel, strides=[1, *strides, 1],
                             padding=padding.upper())
            if use_bias:
                bias = v1.get_variable(
                    "bias", [filters], dtype=v1.float32,
                    initializer=v1.zeros_initializer(), trainable=trainable,
                )
                y = v1.nn.bias_add(y, bias)
        return y

    def batch_normalization(inputs, training=False, trainable=True,
                            epsilon=1e-5):
        assert training is False, "harness builds inference graphs only"
        ch = int(inputs.shape[-1])
        with v1.variable_scope(None, default_name="batch_normalization"):
            gamma = v1.get_variable("gamma", [ch],
                                    initializer=v1.ones_initializer(),
                                    trainable=trainable)
            beta = v1.get_variable("beta", [ch],
                                   initializer=v1.zeros_initializer(),
                                   trainable=trainable)
            mean = v1.get_variable("moving_mean", [ch],
                                   initializer=v1.zeros_initializer(),
                                   trainable=False)
            var = v1.get_variable("moving_variance", [ch],
                                  initializer=v1.ones_initializer(),
                                  trainable=False)
        return v1.nn.batch_normalization(inputs, mean, var, beta, gamma,
                                         epsilon)

    def dropout(inputs, rate=0.5, training=False):
        if not training:
            return v1.identity(inputs)
        return v1.nn.dropout(inputs, rate=rate)

    def flatten(t):
        return v1.reshape(t, [int(t.shape[0] or -1), -1])

    layers.conv2d = conv2d
    layers.batch_normalization = batch_normalization
    layers.dropout = dropout
    layers.flatten = flatten

    shim = types.ModuleType("tensorflow")
    shim.__getattr__ = lambda name: getattr(v1, name)
    shim.layers = layers
    shim.contrib = types.SimpleNamespace(
        layers=types.SimpleNamespace(l2_regularizer=lambda scale: None)
    )
    return shim, v1


def _build_reference(v1, variant: str, h: int, w: int):
    sys.path.insert(0, REFERENCE)
    from lib_yolo import yolov3 as ref_yolo

    config = {
        "crop": False,
        "full_img_size": [h, w, 3],
        "cls_cnt": 2,
        "priors": ref_yolo.ECP_9_PRIORS,
        "freeze_darknet53": True,
        "aleatoric_loss": False,
    }
    cls = {"standard": ref_yolo.yolov3,
           "aleatoric": ref_yolo.yolov3_aleatoric}[variant]
    factory = cls(config)
    inputs = v1.placeholder(v1.float32, [1, h, w, 3])
    factory.init_model(inputs, training=False)
    return factory.get_model(), inputs


def restore_and_forward(variant: str, ckpt: str, out_dir: str, h: int,
                        w: int) -> None:
    """Restore an EXPORTED checkpoint into the reference graph via the
    reference's own mechanism (tf.train.Saver, lib_yolo/train.py:93) and
    snapshot the forward outputs."""
    shim, v1 = make_tf1_shim()
    sys.modules["tensorflow"] = shim
    model, inputs = _build_reference(v1, variant, h, w)
    rng = np.random.default_rng(20260817)
    img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    os.makedirs(out_dir, exist_ok=True)
    with v1.Session() as sess:
        v1.train.Saver().restore(sess, ckpt)
        raws = sess.run([dl.raw_output for dl in model.det_layers],
                        {inputs: img})
    np.savez(os.path.join(out_dir, "golden.npz"), img=img,
             raw1=raws[0], raw2=raws[1], raw3=raws[2])


def main(variant: str, out_dir: str, h: int, w: int) -> None:
    shim, v1 = make_tf1_shim()
    sys.modules["tensorflow"] = shim
    model, inputs = _build_reference(v1, variant, h, w)

    rng = np.random.default_rng(20260816)
    os.makedirs(out_dir, exist_ok=True)
    var_names = []
    with v1.Session() as sess:
        sess.run(v1.global_variables_initializer())
        for var in v1.global_variables():
            shape = [int(d) for d in var.shape]
            name = var.name
            if "kernel" in name:
                fan_in = int(np.prod(shape[:-1]))
                val = rng.normal(0, np.sqrt(2.0 / fan_in), shape)
            elif "moving_variance" in name:
                val = rng.uniform(0.5, 2.0, shape)
            elif "gamma" in name:
                val = rng.uniform(0.5, 1.5, shape)
            else:  # beta / moving_mean / bias
                val = rng.normal(0, 0.2, shape)
            sess.run(var.assign(val.astype(np.float32)))
            var_names.append(name)
        saver = v1.train.Saver()
        ckpt = saver.save(sess, os.path.join(out_dir, "model.ckpt"),
                          global_step=7)
        img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        raws = sess.run([dl.raw_output for dl in model.det_layers],
                        {inputs: img})
    np.savez(os.path.join(out_dir, "golden.npz"), img=img,
             raw1=raws[0], raw2=raws[1], raw3=raws[2])
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"ckpt": ckpt, "variables": sorted(var_names)}, f)


if __name__ == "__main__":
    if sys.argv[1] == "restore":
        restore_and_forward(sys.argv[2], sys.argv[3], sys.argv[4],
                            int(sys.argv[5]), int(sys.argv[6]))
    else:
        main(sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
