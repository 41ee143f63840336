"""Config-driven Runner: the TPU-native analogue of mmengine Runner as the
reference uses it (ref: tools/train.py:130-141 Runner.from_cfg →
runner.train(); tools/test.py → runner.test()).

One data mesh over all devices; batch sharded over 'data'; params
replicated; the jitted train step lets XLA insert the gradient psums
(SURVEY §2.5 TPU-native equivalent).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..config import Config
from ..registry import DATASETS, METRICS, MODELS
from .hooks import (BenchmarkHook, CheckpointHook, DisableObjectSampleHook,
                    Hook, LoggerHook)
from .optim import build_optimizer
from .train_loop import (data_mesh, host_local_rows, make_eval_step,
                         make_train_step, place_batch, replicate_state)
from .train_state import create_train_state


class Runner:
    def __init__(self, cfg: Config, work_dir: str = 'work_dir',
                 resume: bool = False):
        import tpu_bev3d.models      # noqa: F401 — register components
        import tpu_bev3d.evaluation  # noqa: F401 — register metrics
        self.cfg = cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.model = MODELS.build(dict(cfg.model))
        tcfg = cfg.get('train_cfg', {})
        self.batch_size = tcfg.get('batch_size', 1)
        # use as many devices as divide the batch (data-parallel over ICI)
        import math
        if jax.process_count() > 1:
            # multi-process launch (tools/dist_train.sh / TPU pod):
            # cfg batch_size is PER HOST (reference per-GPU semantics) —
            # the global batch is batch_size x process_count, sharded
            # over the SAME number of devices on every host (as many as
            # divide the per-host batch) so each host's loader stripe is
            # its contiguous shard of the global batch
            per_proc = math.gcd(self.batch_size,
                                jax.local_device_count()) or 1
            taken, sel = {}, []
            for d in jax.devices():   # ordered by (process, local id)
                c = taken.setdefault(d.process_index, 0)
                if c < per_proc:
                    sel.append(d)
                    taken[d.process_index] = c + 1
            self.mesh = data_mesh(sel)
        else:
            n_dev = math.gcd(self.batch_size, len(jax.devices())) or 1
            self.mesh = data_mesh(jax.devices()[:n_dev])
        self.max_epochs = tcfg.get('max_epochs', 1)
        self.resume = resume
        self.state = None
        self.train_dataset = None

    # ------------------------------------------------------------ building

    def _build_dataset(self, dcfg):
        from ..datasets import DataLoader  # noqa: F401 — registers datasets
        return DATASETS.build(dict(dcfg))

    def _build_loader(self, dcfg, shuffle, drop_last=True, striped=False):
        from ..datasets import DataLoader
        ds = self._build_dataset(dcfg)
        nw = int(self.cfg.get('num_workers', 4))
        rank, world = (jax.process_index(), jax.process_count()) \
            if striped else (0, 1)
        return ds, DataLoader(ds, batch_size=self.batch_size,
                              shuffle=shuffle, num_workers=nw,
                              drop_last=drop_last, rank=rank,
                              world_size=world)

    def _eval_batches(self, loader, eval_fn, state, metric):
        """Shared SPMD eval inner loop: pad the tail batch to the compiled
        shape, run the mesh-sharded predict, slice padding off, accumulate
        per-sample metric state, then gather across hosts (SURVEY §2.5:
        shard the val set per host, gather metric states; ref mmengine
        BaseMetric rank-0 collect)."""
        from .train_loop import gather_metric_results, pad_batch_dim0
        # multi-process: every rank must run the SAME number of sharded
        # eval steps (they are collectives) even when val stripes are
        # uneven — ranks past their last batch re-feed it with 0 valid
        # rows (ref torch DistributedSampler padding; here no duplicate
        # metric entries, the padding rows are simply not processed)
        n_local = len(loader)
        n_steps = n_local
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            n_steps = int(multihost_utils.process_allgather(
                np.asarray([n_local])).max())
            if n_local == 0 and n_steps > 0:
                raise ValueError(
                    'empty val stripe on this host: the val set has fewer '
                    'samples than processes — shrink the process count or '
                    'grow the val set')
        it = iter(loader)
        host_batch = None
        for i in range(n_steps):
            n_valid = None
            if i < n_local:
                host_batch = next(it)
                arrays, n_valid = pad_batch_dim0(host_batch,
                                                 self.batch_size)
            else:
                arrays, _ = pad_batch_dim0(host_batch, self.batch_size)
                n_valid = 0
            batch = place_batch(arrays, self.mesh)
            preds = host_local_rows(eval_fn(state, batch))
            if n_valid:
                if n_valid < self.batch_size:
                    preds = {k: v[:n_valid] for k, v in preds.items()}
                metric.process(preds, host_batch)
        metric.results = gather_metric_results(metric.results)
        return metric.compute_metrics()

    def _first_device_batch(self, loader):
        import jax.numpy as jnp
        b = next(iter(loader))
        return {k: jnp.asarray(v) for k, v in b.items() if k != 'metainfo'}

    # ------------------------------------------------------------ training

    def train(self):
        tcfg = self.cfg.train_cfg
        ds, loader = self._build_loader(self.cfg.train_dataloader.dataset,
                                        shuffle=True, striped=True)
        self.train_dataset = ds
        steps_per_epoch = max(len(loader), 1)
        total_steps = steps_per_epoch * self.max_epochs
        tx, sched = build_optimizer(
            tcfg.get('optimizer', {}), total_steps,
            tcfg.get('scheduler'), tcfg.get('clip_grad_norm'))
        batch0 = self._first_device_batch(loader)
        self.state = create_train_state(self.model, batch0, tx)
        start_epoch = 0
        if self.resume:
            from .checkpoint import latest_checkpoint, restore_checkpoint
            p = latest_checkpoint(self.work_dir)
            if p:
                self.state = restore_checkpoint(p, jax.device_get(self.state))
                start_epoch = int(self.state.step) // steps_per_epoch
                print(f'[resume] from {p} at epoch {start_epoch}')
        self.state = replicate_state(self.state, self.mesh)
        step_fn = make_train_step(self.model, tx)

        hooks: List[Hook] = [
            LoggerHook(interval=int(self.cfg.get('log_interval', 50)),
                       work_dir=self.work_dir),
            BenchmarkHook(self.batch_size),
            CheckpointHook(self.work_dir,
                           int(self.cfg.get('checkpoint_interval', 1))),
        ]
        for hcfg in self.cfg.get('custom_hooks', []):
            if hcfg.get('type') == 'DisableObjectSampleHook':
                hooks.append(DisableObjectSampleHook(
                    hcfg.get('disable_after_epoch', 15)))
            elif hcfg.get('type') == 'Det3DVisualizationHook':
                from .hooks import Det3DVisualizationHook
                hooks.append(Det3DVisualizationHook(
                    self.work_dir,
                    hcfg.get('interval_epochs', 1),
                    hcfg.get('score_thr', 0.3)))

        # optional profiler trace (ref BenchmarkHook + jax.profiler; set
        # cfg.profile_steps = [start, end] to capture a trace)
        prof = self.cfg.get('profile_steps')
        step = int(jax.device_get(self.state.step))
        for epoch in range(start_epoch, self.max_epochs):
            loader.set_epoch(epoch)
            for h in hooks:
                h.before_epoch(self, epoch)
            for host_batch in loader:
                import jax.numpy as jnp
                if prof and step == prof[0]:
                    jax.profiler.start_trace(
                        os.path.join(self.work_dir, 'trace'))
                batch = {k: v for k, v in host_batch.items()
                         if k != 'metainfo'}
                batch = place_batch(batch, self.mesh)
                self.state, metrics = step_fn(self.state, batch)
                step += 1
                if prof and step == prof[1]:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                for h in hooks:
                    h.after_iter(self, step, metrics)
            self._maybe_val_sample(hooks)
            self._maybe_validate(epoch)
            for h in hooks:
                h.after_epoch(self, epoch)
        return self.state

    # ---------------------------------------------------------- validation

    def _maybe_validate(self, epoch: int):
        """In-training validation (ref mmengine ValLoop driven by
        train_cfg val_interval, SURVEY §3.1): every ``val_interval``
        epochs run the metric over the val loader, log it, and keep a
        ``best`` checkpoint when the tracked key improves."""
        tcfg = self.cfg.get('train_cfg', {})
        interval = int(tcfg.get('val_interval', 0) or 0)
        vcfg = self.cfg.get('val_dataloader')
        if interval <= 0 or not vcfg:
            return
        if (epoch + 1) % interval != 0:
            return
        out = self.validate()
        key = self.cfg.get('val_key')
        if key is None:
            for cand in ('NDS', 'mAP', 'm3d_AP40', 'miou'):
                if cand in out and np.isfinite(out[cand]):
                    key = cand
                    break
            key = key or next((k for k, v in out.items()
                               if np.isfinite(v)), None)
        if key is None:
            return
        score = float(out[key])
        self.val_history = getattr(self, 'val_history', [])
        self.val_history.append((epoch, key, score))
        best = getattr(self, 'best_val', None)
        if best is None or score > best:
            self.best_val = score
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(os.path.join(self.work_dir, 'best')),
                       jax.device_get(self.state), force=True)
            ckptr.wait_until_finished()
            print(f'[val] epoch {epoch}: {key}={score:.4f} (new best)')
        else:
            print(f'[val] epoch {epoch}: {key}={score:.4f} '
                  f'(best {self.best_val:.4f})')

    def validate(self, state=None) -> Dict[str, float]:
        """One metrics pass over the val loader with the CURRENT state —
        batches sharded over the data mesh, tail batch padded+masked."""
        vcfg = self.cfg.get('val_dataloader') or self.cfg.test_dataloader
        if not hasattr(self, '_val_loader'):
            _, self._val_loader = self._build_loader(
                vcfg.dataset, shuffle=False, drop_last=False, striped=True)
            self._val_eval_fn = make_eval_step(self.model, self.mesh)
        metric = METRICS.build(dict(self.cfg.get(
            'val_evaluator',
            self.cfg.get('test_evaluator', {'type': 'NuScenesMetric'}))))
        state = state or self.state
        return self._eval_batches(self._val_loader, self._val_eval_fn,
                                  state, metric)

    def _maybe_val_sample(self, hooks):
        """Run predict on one val batch for Det3DVisualizationHook (the
        reference renders inside the val loop; this Runner validates via
        test(), so the hook gets a single-batch sample per epoch)."""
        from .hooks import Det3DVisualizationHook
        if not any(isinstance(h, Det3DVisualizationHook) for h in hooks):
            return
        vcfg = self.cfg.get('val_dataloader') or self.cfg.get(
            'test_dataloader')
        if not vcfg:
            return
        import jax.numpy as jnp
        if not hasattr(self, '_vis_loader'):
            _, self._vis_loader = self._build_loader(vcfg.dataset,
                                                     shuffle=False)
            self._vis_eval_fn = make_eval_step(self.model)
        host_batch = next(iter(self._vis_loader))
        batch = {k: jnp.asarray(v) for k, v in host_batch.items()
                 if k != 'metainfo'}
        self.last_val_batch = host_batch
        self.last_val_preds = jax.device_get(
            self._vis_eval_fn(self.state, batch))

    # ---------------------------------------------------------- evaluation

    def test(self, state=None) -> Dict[str, float]:
        ds, loader = self._build_loader(self.cfg.test_dataloader.dataset,
                                        shuffle=False, drop_last=False,
                                        striped=True)
        metric = METRICS.build(dict(self.cfg.get(
            'test_evaluator', {'type': 'NuScenesMetric'})))
        state = state or self.state
        if state is None:
            from .checkpoint import latest_checkpoint, restore_checkpoint
            tcfg = self.cfg.get('train_cfg', {})
            # build the optimizer EXACTLY as train() did: scheduler and
            # grad-clip change the opt-state tree structure, and orbax
            # restore requires a matching target
            tx, _ = build_optimizer(tcfg.get('optimizer', {}), 1,
                                    tcfg.get('scheduler'),
                                    tcfg.get('clip_grad_norm'))
            batch0 = self._first_device_batch(loader)
            state = create_train_state(self.model, batch0, tx)
            p = latest_checkpoint(self.work_dir)
            if p:
                state = restore_checkpoint(p, jax.device_get(state))
        eval_fn = make_eval_step(self.model, self.mesh)
        out = self._eval_batches(loader, eval_fn, state, metric)
        print('[eval]', {k: round(float(v), 4) for k, v in out.items()
                         if not np.isnan(v)})
        return out
