#!/usr/bin/env python
"""Fold BatchNorm statistics into the preceding conv/dense kernel of each
module scope (ref: tools/misc/fuse_conv_bn.py — deploy-time conv+BN
fusion; there torch Module surgery, here a pure pytree rewrite).

For every module scope in the params tree that contains exactly one conv
kernel ('kernel' with ndim >= 2, output channels last) and exactly one BN
child scope (param leaves 'scale'/'bias' + batch_stats 'mean'/'var') with
matching channel count, rewrite:

    k'        = k * s / sqrt(v + eps)        (per output channel)
    BN bias'  = bias_bn - mean * s / sqrt(v + eps)
    BN scale' = 1, mean' = 0, var' = 1 - eps

The param tree STRUCTURE is unchanged (no conv bias is invented — many
conv layers here have none), outputs are bit-equal at inference, and the
BN normalization math constant-folds to a single add.

Usage: python tools/misc/fuse_conv_bn.py CONFIG CKPT_DIR OUT_DIR
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

BN_EPS_DEFAULT = 1e-3   # MaskedBatchNorm/nn.BatchNorm default in this repo


def _is_bn_scope(pdict, sdict):
    return (isinstance(pdict, dict) and set(pdict) >= {'scale', 'bias'}
            and isinstance(sdict, dict) and set(sdict) >= {'mean', 'var'})


def _is_conv_scope(pdict):
    """A leaf conv/dense scope: exactly kernel (+ optional bias), kernel
    with output channels LAST (flax Conv/ConvTranspose/Dense layout)."""
    return (isinstance(pdict, dict) and 'kernel' in pdict
            and getattr(pdict.get('kernel'), 'ndim', 0) >= 2
            and set(pdict) <= {'kernel', 'bias'})


def fuse_tree(params, batch_stats, eps=BN_EPS_DEFAULT):
    """Returns (params', batch_stats', n_fused). Pure function of trees.

    Fuses sibling child scopes: a module scope holding exactly one conv
    child (``Conv_0/{kernel}``, ``ConvTranspose_0``, ``Dense_0``) and one
    BN child (``BatchNorm_0``/``MaskedBatchNorm_0``: scale/bias params +
    mean/var stats) — the ConvBNAct layout every conv block in this repo
    uses (tpu_bev3d/models/layers/common.py:23)."""
    import numpy as np

    n_fused = 0

    def rec(p, s):
        nonlocal n_fused
        if not isinstance(p, dict):
            return p, s
        p = dict(p)
        s = dict(s) if isinstance(s, dict) else {}
        conv_keys = [k for k in p if _is_conv_scope(p[k])]
        bn_keys = [k for k in p if _is_bn_scope(p.get(k), s.get(k))]
        if len(conv_keys) == 1 and len(bn_keys) == 1:
            ck, bn = conv_keys[0], bn_keys[0]
            k = np.asarray(p[ck]['kernel'])
            cout = k.shape[-1]
            scale = np.asarray(p[bn]['scale'])
            if scale.shape == (cout,):
                mean = np.asarray(s[bn]['mean'])
                var = np.asarray(s[bn]['var'])
                bias_bn = np.asarray(p[bn]['bias'])
                f = scale / np.sqrt(var + eps)
                conv = dict(p[ck], kernel=(k * f).astype(k.dtype))
                shift = mean * f
                if 'bias' in conv:
                    conv['bias'] = (np.asarray(conv['bias']) * f).astype(
                        k.dtype)
                p[ck] = conv
                p[bn] = dict(p[bn], scale=np.ones_like(scale),
                             bias=(bias_bn - shift).astype(bias_bn.dtype))
                s[bn] = dict(s[bn], mean=np.zeros_like(mean),
                             var=np.full_like(var, 1.0 - eps))
                n_fused += 1
        for key in list(p):
            if isinstance(p[key], dict) and key not in bn_keys \
                    and not _is_conv_scope(p[key]):
                p[key], snew = rec(p[key], s.get(key, {}))
                if key in s or snew:
                    s[key] = snew
        return p, s

    p2, s2 = rec(params, batch_stats)
    return p2, s2, n_fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('out_dir')
    p.add_argument('--eps', type=float, default=BN_EPS_DEFAULT,
                   help='BN eps used by the model (MaskedBatchNorm 1e-3; '
                        'flax nn.BatchNorm scopes use 1e-5)')
    args = p.parse_args()
    import jax
    import jax.numpy as jnp

    from tpu_bev3d.apis import init_model
    from tpu_bev3d.engine.checkpoint import save_checkpoint
    from tpu_bev3d.engine.optim import build_optimizer
    from tpu_bev3d.engine.train_state import TrainState

    model = init_model(args.config, args.checkpoint)
    v = jax.device_get(model.variables)
    params, stats, n = fuse_tree(v['params'], v.get('batch_stats', {}),
                                 eps=args.eps)
    print(f'fused {n} conv+BN pairs')
    os.makedirs(args.out_dir, exist_ok=True)
    # save in the TrainState layout init_model(--checkpoint) restores
    tx, _ = build_optimizer({'type': 'adamw'}, 1)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    save_checkpoint(args.out_dir, 0, jax.device_get(state))
    print(f'wrote fused checkpoint to {args.out_dir}')


if __name__ == '__main__':
    main()
