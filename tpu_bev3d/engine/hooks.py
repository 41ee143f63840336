"""Training hooks as plain callbacks.

Refs: mmdet3d/engine/hooks/benchmark_hook.py:9 (samples/s, 50-iter warmup
skip), disable_object_sample_hook.py:12 (turn off GT-paste at a given
epoch), mmengine LoggerHook/CheckpointHook (config:379-384).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Hook:
    def before_epoch(self, runner, epoch: int):
        pass

    def after_iter(self, runner, step: int, metrics: Dict[str, Any]):
        pass

    def after_epoch(self, runner, epoch: int):
        pass


class LoggerHook(Hook):
    """Interval logging + json log file (ref LoggerHook interval=50)."""

    def __init__(self, interval: int = 50, work_dir: Optional[str] = None):
        self.interval = interval
        self.log_path = os.path.join(work_dir, 'train_log.jsonl') \
            if work_dir else None
        self._t0 = time.time()

    def after_iter(self, runner, step, metrics):
        if step % self.interval:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        dt = time.time() - self._t0
        self._t0 = time.time()
        line = dict(step=int(step), time_per_interval=round(dt, 3),
                    **{k: round(v, 5) for k, v in scalars.items()})
        print(f'[train] {line}')
        if self.log_path:
            with open(self.log_path, 'a') as f:
                f.write(json.dumps(line) + '\n')


class BenchmarkHook(Hook):
    """Mean train samples/s per epoch, skipping warmup iters
    (ref benchmark_hook.py:14-38)."""

    def __init__(self, batch_size: int, warmup_iters: int = 50):
        self.batch_size = batch_size
        self.warmup = warmup_iters
        self._count = 0
        self._start = None

    def before_epoch(self, runner, epoch):
        self._count = 0
        self._start = None

    def after_iter(self, runner, step, metrics):
        self._count += 1
        if self._count == self.warmup:
            self._start = time.time()

    def after_epoch(self, runner, epoch):
        if self._start and self._count > self.warmup:
            n = (self._count - self.warmup) * self.batch_size
            sps = n / (time.time() - self._start)
            print(f'[benchmark] epoch {epoch}: {sps:.2f} samples/s')


class CheckpointHook(Hook):
    def __init__(self, work_dir: str, interval_epochs: int = 1,
                 keep: int = 3):
        self.work_dir = work_dir
        self.interval = interval_epochs
        self.keep = keep

    def after_epoch(self, runner, epoch):
        if (epoch + 1) % self.interval == 0:
            from .checkpoint import save_checkpoint
            import jax
            state = jax.device_get(runner.state)
            p = save_checkpoint(self.work_dir, int(state.step), state,
                                self.keep)
            print(f'[checkpoint] saved {p}')


class DisableObjectSampleHook(Hook):
    """Turn off GT-paste augmentation after N epochs
    (ref disable_object_sample_hook.py:12-59)."""

    def __init__(self, disable_after_epoch: int = 15):
        self.disable_after_epoch = disable_after_epoch

    def before_epoch(self, runner, epoch):
        if epoch < self.disable_after_epoch:
            return
        ds = getattr(runner, 'train_dataset', None)
        pipeline = getattr(ds, 'pipeline', None)
        # pipeline is a closure over transform objects; find ObjectSample
        import inspect
        cells = inspect.getclosurevars(pipeline).nonlocals \
            if pipeline else {}
        for t in cells.get('tfs', []):
            if type(t).__name__ == 'ObjectSample':
                t.disabled = True


class Det3DVisualizationHook(Hook):
    """Render one val sample's BEV predictions per epoch (ref
    mmdet3d/engine/hooks/visualization_hook.py:97-160 — the reference
    draws val/test predictions at `interval`; headless analogue writes
    PNGs to work_dir/vis via Det3DVisualizer.draw_bev)."""

    def __init__(self, work_dir: str, interval_epochs: int = 1,
                 score_thr: float = 0.3,
                 pc_range=(-54, -54, 54, 54)):
        import os
        self.dir = os.path.join(work_dir, 'vis')
        os.makedirs(self.dir, exist_ok=True)
        self.interval = interval_epochs
        self.score_thr = score_thr
        self.pc_range = tuple(pc_range)

    def after_epoch(self, runner, epoch):
        if (epoch + 1) % self.interval:
            return
        batch = getattr(runner, 'last_val_batch', None)
        preds = getattr(runner, 'last_val_preds', None)
        if batch is None or preds is None:
            return
        import os
        import numpy as np
        from ..visualization.visualizer import Det3DVisualizer
        vis = Det3DVisualizer()
        pts = np.asarray(batch['points'][0])
        msk = np.asarray(batch.get('points_mask', [None])[0]) \
            if 'points_mask' in batch else None
        if msk is not None:
            pts = pts[msk.astype(bool)]
        keep = np.asarray(preds['scores'][0]) > self.score_thr
        vis.draw_bev(
            points=pts,
            gt_bboxes=np.asarray(batch['gt_bboxes_3d'][0])[
                np.asarray(batch['gt_mask'][0]).astype(bool)]
            if 'gt_bboxes_3d' in batch else None,
            pred_bboxes=np.asarray(preds['bboxes'][0])[keep],
            pred_labels=np.asarray(preds['labels'][0])[keep],
            out_file=os.path.join(self.dir, f'epoch{epoch + 1}.png'),
            pc_range=self.pc_range)
