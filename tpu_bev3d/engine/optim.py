"""Optimizer + LR schedule construction (optax).

TPU-native replacement for mmengine's OptimWrapper/ParamScheduler stack as
the reference configures it (ref: projects/BEVFusion/configs/nuscenes/
…lidar…py:322-372 — AdamW lr 1e-4 wd 0.01, CosineAnnealingLR + cyclic
momentum, grad clip max_norm 35 norm_type 2; tools/train.py:92-104 AMP).

The reference's cyclic schedule (mmengine CosineAnnealingLR in two phases)
is the one-cycle policy: LR rises to lr*10 over 40% of training then decays
to lr*1e-4; momentum mirrors inversely (0.85/0.95). Implemented as an optax
schedule so everything stays inside the jitted update.
"""
from __future__ import annotations

import math
from typing import Optional

import optax


def build_schedule(cfg: dict, base_lr: float, total_steps: int):
    """cfg: {'type': 'cyclic'|'cosine'|'step'|'const', ...}."""
    typ = cfg.get('type', 'cyclic')
    if typ == 'cyclic':
        up, down = cfg.get('target_ratio', (10, 1e-4))
        frac_up = cfg.get('step_ratio_up', 0.4)
        peak = base_lr * up
        end = base_lr * down
        n_up = max(int(total_steps * frac_up), 1)
        return optax.join_schedules([
            _cosine_anneal(base_lr, peak, n_up),
            _cosine_anneal(peak, end, max(total_steps - n_up, 1)),
        ], [n_up])
    if typ == 'cosine':
        return optax.cosine_decay_schedule(
            base_lr, total_steps, alpha=cfg.get('min_lr_ratio', 1e-4))
    if typ == 'step':
        steps = cfg.get('milestones', [])
        gamma = cfg.get('gamma', 0.1)
        return optax.piecewise_constant_schedule(
            base_lr, {s: gamma for s in steps})
    return lambda _: base_lr


def _cosine_anneal(start: float, end: float, steps: int):
    def sched(t):
        import jax.numpy as jnp
        frac = jnp.clip(t / steps, 0.0, 1.0)
        return end + (start - end) * 0.5 * (1 + jnp.cos(math.pi * frac))
    return sched


def build_optimizer(cfg: dict, total_steps: int = 10000,
                    schedule_cfg: Optional[dict] = None,
                    clip_grad_norm: Optional[float] = None):
    """Build an optax GradientTransformation from a train_cfg-style dict.

    Returns (tx, lr_schedule_fn).
    """
    typ = cfg.get('type', 'adamw')
    lr = cfg.get('lr', 1e-4)
    sched = build_schedule(schedule_cfg or {'type': 'const'}, lr, total_steps)
    if typ == 'adamw':
        b1, b2 = cfg.get('betas', (0.9, 0.999))
        opt = optax.adamw(sched, b1=b1, b2=b2,
                          weight_decay=cfg.get('weight_decay', 0.01))
    elif typ == 'adam':
        opt = optax.adam(sched)
    elif typ == 'sgd':
        opt = optax.sgd(sched, momentum=cfg.get('momentum', 0.9))
    else:
        raise ValueError(typ)
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(opt)
    return optax.chain(*chain), sched
