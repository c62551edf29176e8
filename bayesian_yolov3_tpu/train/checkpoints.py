"""Checkpointing with orbax (replaces tf.train.Saver, train.py:79-108).

Layout: ``<checkpoint_path>/<run_id>/<step>/...`` managed by an orbax
CheckpointManager with ``max_to_keep`` (reference config
``ckp_max_to_keep``).  ``resume='last'`` restores the newest step —
matching the reference's ``tf.train.latest_checkpoint`` + step-from-
filename recovery (train.py:97-102); a config JSON snapshot is written next
to the checkpoints (parity train.save_config, train.py:12-22).
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, root: str, run_id: str, max_to_keep: int = 1):
        self.dir = os.path.abspath(os.path.join(root, run_id))
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save_config_snapshot(self, config) -> str:
        stamp = datetime.datetime.now().isoformat().split(".")[0]
        path = os.path.join(self.dir, f"config_{stamp}.json")
        with open(path, "w") as f:
            f.write(config.to_json())
        return path

    def save(self, step: int, state: Dict[str, Any], force: bool = False):
        if step in (self.manager.all_steps() or []):
            return  # idempotent: interval save + exit save can coincide
        self.manager.save(step, args=ocp.args.StandardSave(state), force=force)
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_like: Dict[str, Any], step: Any = "last"):
        """Restore into the structure of ``state_like``.

        step='last' -> newest (reference resume_checkpoint='last'); else an
        explicit int step (reference inference 'step' config key).
        """
        if step == "last":
            step = self.latest_step()
            assert step is not None, f"no checkpoints in {self.dir}"
        restored = self.manager.restore(
            int(step), args=ocp.args.StandardRestore(state_like)
        )
        return restored, int(step)

    def restore_partial(self, like: Dict[str, Any], step: Any = "last"):
        """Restore only the top-level keys present in ``like`` (e.g. params/
        frozen/stats for inference, without the optimizer state).

        Every restored leaf is shape-checked against ``like``: orbax
        restores arrays at their SAVED shapes when no target is enforced,
        so loading a checkpoint of a different model variant (e.g. a
        standard-trained run into an aleatoric config — det convs 21 vs
        42 wide) would otherwise surface as a shape assert deep inside
        the first compiled kernel instead of here.  The reference's
        tf.train.Saver fails loudly at restore for the same mismatch.
        """
        import jax

        if step == "last":
            step = self.latest_step()
            assert step is not None, f"no checkpoints in {self.dir}"
        full = self.manager.restore(int(step))
        missing = [k for k in like if k not in full]
        assert not missing, f"checkpoint at step {step} lacks keys {missing}"
        out = {k: full[k] for k in like}
        mismatches = []

        def _check(path, want, got):
            ws = getattr(want, "shape", None)
            gs = getattr(got, "shape", None)
            if ws != gs:
                name = jax.tree_util.keystr(path)
                mismatches.append(f"{name}: checkpoint {gs} vs model {ws}")
            return got

        for k in out:
            out[k] = jax.tree_util.tree_map_with_path(
                _check, like[k], out[k])
        if mismatches:
            raise ValueError(
                f"checkpoint at step {step} does not match this model's "
                f"shapes — wrong variant or config? "
                + "; ".join(mismatches[:5])
                + (f" (+{len(mismatches) - 5} more)"
                   if len(mismatches) > 5 else "")
            )
        return out, int(step)

    def all_steps(self):
        return self.manager.all_steps()

    def close(self):
        self.manager.close()
