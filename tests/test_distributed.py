"""Multi-host (DCN) wiring: 2-process CPU jax.distributed tests.

The reference is strictly single-process/single-GPU (train.py:42); the
multi-host layer (SURVEY §5.8) is net-new.  These tests spawn two real
processes, bring them up via ``Config.coordinator_address`` ->
``parallel.mesh.maybe_initialize_from_config``, and run a data-parallel
training step over the global (cross-process) mesh with per-host shard
reading — the full production path, just on CPU devices over the Gloo
collective backend.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from bayesian_yolov3_tpu.data import tfrecord

import synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np

    from bayesian_yolov3_tpu.config import Config, DataConfig
    from bayesian_yolov3_tpu.train import loop as train_loop

    pid = int(sys.argv[1])
    cfg = Config(
        model="standard",
        full_img_size=(64, 96, 3),
        batch_size=4,                      # global batch over 4 devices
        max_boxes_per_img=8,
        train_steps=2,
        checkpoint_interval=2,
        darknet53_weights="",
        checkpoint_path=os.path.join({tmp!r}, "ckpt"),
        tensorboard_path=os.path.join({tmp!r}, "tb"),
        run_id="dist",
        mesh_shape={{"data": 4}},
        compute_dtype="float32",
        train=DataConfig(file_pattern={pattern!r}, shuffle_buffer_size=2),
        val=DataConfig(file_pattern={pattern!r}, shuffle_buffer_size=2),
        coordinator_address="127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    trainer = train_loop.Trainer(cfg, seed=0)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    out = trainer.run()
    total = float(out["state"]["step"])
    w = out["state"]["params"]["det1"]["w"]
    assert len(w.sharding.device_set) == 4
    print(json.dumps({{
        "pid": pid,
        "step": out["step"],
        "state_step": total,
        "w_sum": float(np.asarray(w).sum()),
    }}), flush=True)
    """
)


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path, rng):
    """Full Trainer over a 2-process x 2-device global mesh: distributed
    init from Config, per-host shard striping, global-batch assembly,
    replicated params, checkpoint written once."""
    pattern = synth.write_dataset(str(tmp_path / "data"), rng, n_images=8,
                                  img_hw=(64, 96), shards=4)
    port = _free_port()
    prog = _WORKER.format(
        repo=REPO, tests=os.path.join(REPO, "tests"), tmp=str(tmp_path),
        pattern=pattern, port=port,
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, (
            f"proc {i} rc={p.returncode}\nstdout:{out.decode()[-2000:]}\n"
            f"stderr:{err.decode()[-3000:]}"
        )
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))
    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["step"] == 2 for o in outs)
    # both processes hold identical (replicated) trained params
    assert outs[0]["w_sum"] == outs[1]["w_sum"]
    # exactly one metrics file (process 0 writes, process 1 is silenced)
    mdir = tmp_path / "ckpt" / "dist"
    assert (mdir / "metrics.jsonl").exists()


def test_shard_striping_disjoint_and_complete(tmp_path, rng):
    """Per-host shard subsets partition the record set (SURVEY §5.8)."""
    pattern = synth.write_dataset(str(tmp_path / "d"), rng, n_images=8,
                                  img_hw=(32, 32), shards=4)
    all_recs = list(tfrecord.read_shards(pattern))
    per_host = [
        list(tfrecord.read_shards(pattern, shard_index=i, shard_count=2))
        for i in range(2)
    ]
    assert sorted(b.hex() for b in all_recs) == sorted(
        b.hex() for host in per_host for b in host
    )
    assert not (set(b.hex() for b in per_host[0])
                & set(b.hex() for b in per_host[1]))
