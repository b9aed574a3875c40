"""Checkpoint save/resume (orbax) — the DCP/ZeRO-checkpoint replacement.

Parity targets:
  * xtuner_lite torch-DCP sharded save/load with step counter + scheduler
    state (src/xtuner_lite/llava_train_sp.py:888-925, 1050-1140);
  * mmengine CheckpointHook interval/max_keep (configs/auroracap/
    auroracap_7b_pretrain_stage.py:174-179);
  * auto-resume from the latest checkpoint (llava_train_sp.py:462-476).

Orbax writes sharding-aware checkpoints: params laid out on a mesh restore
onto the same (or a different) mesh without any gather/consolidate step —
the reference's 696-line zero_to_any_dtype.py consolidation tool has no
TPU-side equivalent to build.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _mgr(ckpt_dir: str, max_keep: int = 2):
    import orbax.checkpoint as ocp
    from aurora_tpu.utils.fileio import normalize_ckpt_dir
    return ocp.CheckpointManager(
        normalize_ckpt_dir(ckpt_dir),  # gs:// URIs pass through verbatim
        options=ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state, step: int,
                    max_keep: int = 2) -> None:
    """state: TrainState (params/opt_state/step) or any pytree."""
    import orbax.checkpoint as ocp
    mgr = _mgr(ckpt_dir, max_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(
        lambda x: x, state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    from aurora_tpu.utils.fileio import is_remote
    if not is_remote(ckpt_dir) and not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target,
                       step: Optional[int] = None):
    """Restore into the structure/shardings of `target` (an abstract or
    concrete TrainState pytree)."""
    import orbax.checkpoint as ocp
    mgr = _mgr(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored
