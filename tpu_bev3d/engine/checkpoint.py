"""Checkpoint save/restore (orbax).

Ref: mmengine CheckpointHook + auto-resume (tools/train.py:34-41,122-127 —
``--resume auto`` finds the latest checkpoint in work_dir). Orbax handles
the multi-host/multi-device cases natively.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(work_dir: str, step: int, state: Any,
                    keep: int = 3) -> str:
    path = os.path.abspath(os.path.join(work_dir, f'ckpt_{step}'))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # prune old
    all_ckpts = sorted(
        (d for d in os.listdir(work_dir) if d.startswith('ckpt_')),
        key=lambda d: int(d.split('_')[1]))
    for d in all_ckpts[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(work_dir, d), ignore_errors=True)
    return path


def latest_checkpoint(work_dir: str) -> Optional[str]:
    if not os.path.isdir(work_dir):
        return None
    ckpts = [d for d in os.listdir(work_dir) if d.startswith('ckpt_')]
    if not ckpts:
        return None
    latest = max(ckpts, key=lambda d: int(d.split('_')[1]))
    return os.path.abspath(os.path.join(work_dir, latest))


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a concrete TrainState)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)
