"""Torch → JAX checkpoint conversion.

The reference ships torch checkpoints (mmengine CheckpointHook output);
parity evaluation needs their weights in our flax param tree (SURVEY §5
checkpoint/resume: "a torch→jax weight converter is required for parity
evaluation"; cf. the reference's own spconv weight-layout shim,
mmdet3d/models/layers/spconv/overwrite_spconv/write_spconv2.py).

Layout rules implemented here:
- Conv2d:      torch [O, I, kh, kw]   → flax NHWC [kh, kw, I, O]
- ConvTranspose2d: torch [I, O, kh, kw] → flax [kh, kw, I, O] (flax
  ConvTranspose kernel layout) with spatial flip
- Linear:      torch [O, I]           → flax [I, O]
- BatchNorm:   weight/bias → scale/bias params; running_* → batch_stats
- SparseConv3d (spconv v2): torch [O, kz, ky, kx, I] → ours [K³, I, O]
  with K³ enumerated z-major (matches ops/sparse_conv._offsets)

``convert_torch_checkpoint`` takes a torch state_dict (or .pth path) and a
name-mapping table {torch_prefix: flax_path_tuple}; unmapped tensors are
reported. Model-specific mapping tables live alongside the configs.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def conv2d_kernel(w):
    return np.transpose(_to_np(w), (2, 3, 1, 0))


def deconv2d_kernel(w):
    # torch ConvTranspose2d [I, O, kh, kw]; flax ConvTranspose expects
    # [kh, kw, I, O] and flips spatially relative to torch
    w = np.transpose(_to_np(w), (2, 3, 0, 1))
    return w[::-1, ::-1]


def linear_kernel(w):
    return np.transpose(_to_np(w), (1, 0))


def conv1d_kernel(w):
    """torch Conv1d k=1 [O, I, 1] → flax Dense [I, O]."""
    return np.transpose(_to_np(w)[..., 0], (1, 0))


def _mha_in(w, third):
    """torch MultiheadAttention in_proj_weight [3E, E] → one of q/k/v as
    flax DenseGeneral kernel [E, E] (reshaped to [E, h, dh] by target)."""
    w = _to_np(w)
    E = w.shape[-1] if w.ndim == 2 else w.shape[0] // 3
    s = w.shape[0] // 3
    part = w[third * s:(third + 1) * s]
    return part.T if w.ndim == 2 else part   # weight → [E,E]; bias → [E]


def mha_q(w):
    return _mha_in(w, 0)


def mha_k(w):
    return _mha_in(w, 1)


def mha_v(w):
    return _mha_in(w, 2)


def mha_out(w):
    """out_proj.weight [E, E] → flax out kernel [E(in), E(out)] (reshaped
    to [h, dh, E] by target)."""
    return np.transpose(_to_np(w), (1, 0))


def sparse_conv_kernel(w):
    """spconv v2 [O, kz, ky, kx, I] → [K³(z-major), I, O]."""
    w = _to_np(w)
    O, kz, ky, kx, I = w.shape
    w = np.transpose(w, (1, 2, 3, 4, 0))       # [kz,ky,kx,I,O]
    return w.reshape(kz * ky * kx, I, O)


def tsparse_even_kernel(w):
    """torchsparse spnn.Conv3d EVEN-volume kernel [K³, I, O] → our
    z-outer/x-fastest offset order. torchsparse 2.x get_kernel_offsets
    enumerates even kernels x-outer/z-fastest (odd kernels already match
    our order and pass through '|raw'). Documented assumption — no
    torchsparse in this image; the order is parity-tested against the
    from-spec oracle in tests/torch_refs/minkunet_ref.py."""
    w = _to_np(w)
    k = round(w.shape[0] ** (1 / 3))
    assert k ** 3 == w.shape[0] and k % 2 == 0, w.shape
    idx = np.arange(k ** 3).reshape(k, k, k)    # [x, y, z] torch order
    perm = np.transpose(idx, (2, 1, 0)).reshape(-1)  # → [z, y, x] ours
    return w[perm]


def relpos_bias_resample(t, window_target: int) -> np.ndarray:
    """Swin relative-position bias table [(2w'-1)², h] → target window's
    [(2w-1)², h] by bicubic resampling of the 2D bias grid — the standard
    Swin window-transfer recipe (used e.g. when finetuning at a new
    window/resolution). Identity when windows match."""
    a = _to_np(t)
    src = int(round(np.sqrt(a.shape[0])))
    tgt = 2 * window_target - 1
    if src == tgt:
        return a
    img = a.reshape(src, src, -1)
    import jax
    out = jax.image.resize(img, (tgt, tgt, img.shape[-1]), method='cubic')
    return np.asarray(out).reshape(tgt * tgt, -1)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    return ckpt.get('state_dict', ckpt)


def set_in_tree(tree: dict, path: Sequence[str], value: np.ndarray,
                strict_shape: bool = True):
    node = tree
    for p in path[:-1]:
        node = node[p]
    tgt = node[path[-1]]
    if hasattr(tgt, 'shape') and tuple(tgt.shape) != tuple(value.shape):
        if np.prod(tgt.shape) == np.prod(value.shape):
            # same element count, different factoring (e.g. [E, E] →
            # DenseGeneral [E, h, dh]): row-major reshape is the contract
            value = value.reshape(tgt.shape)
        elif strict_shape:
            raise ValueError(
                f'shape mismatch at {"/".join(path)}: '
                f'{tgt.shape} vs {value.shape}')
    node[path[-1]] = value


def convert_torch_checkpoint(state_dict, variables: dict,
                             mapping: Dict[str, Tuple[str, ...]],
                             verbose: bool = True) -> dict:
    """Apply a {torch_name: (collection, *flax_path)} mapping.

    torch_name may end with a converter tag '|conv2d', '|deconv2d',
    '|linear', '|spconv', '|raw' (default raw). Returns new variables dict
    (deep-copied, numpy leaves).
    """
    import jax
    from flax.core import unfreeze
    out = unfreeze(jax.tree_util.tree_map(np.asarray, variables))
    converters = dict(conv2d=conv2d_kernel, deconv2d=deconv2d_kernel,
                      linear=linear_kernel, conv1d=conv1d_kernel,
                      spconv=sparse_conv_kernel,
                      tsparse_even=tsparse_even_kernel,
                      mha_q=mha_q, mha_k=mha_k,
                      mha_v=mha_v, mha_out=mha_out, raw=_to_np)
    used = set()
    for tname, fpath in mapping.items():
        name, _, tag = tname.partition('|')
        if name not in state_dict:
            if verbose:
                print(f'[convert] MISSING in torch ckpt: {name}')
            continue
        if tag.startswith('relpos'):
            val = relpos_bias_resample(state_dict[name], int(tag[6:]))
        else:
            val = converters[tag or 'raw'](state_dict[name])
        set_in_tree(out, fpath, val)
        used.add(name)
    if verbose:
        unused = [k for k in state_dict if k not in used]
        if unused:
            print(f'[convert] {len(unused)} torch tensors unmapped '
                  f'(first 5: {unused[:5]})')
    return out


def auto_map_convbn(torch_prefix: str, flax_prefix: Tuple[str, ...],
                    kind: str = 'conv2d') -> Dict[str, Tuple[str, ...]]:
    """Mapping entries for a ConvModule-style conv+BN pair onto ConvBNAct:
    torch '<p>.conv.weight' + '<p>.bn.*' → flax Conv_0 / BatchNorm_0."""
    return {
        f'{torch_prefix}.conv.weight|{kind}':
            ('params',) + flax_prefix + ('Conv_0', 'kernel'),
        f'{torch_prefix}.bn.weight':
            ('params',) + flax_prefix + ('BatchNorm_0', 'scale'),
        f'{torch_prefix}.bn.bias':
            ('params',) + flax_prefix + ('BatchNorm_0', 'bias'),
        f'{torch_prefix}.bn.running_mean':
            ('batch_stats',) + flax_prefix + ('BatchNorm_0', 'mean'),
        f'{torch_prefix}.bn.running_var':
            ('batch_stats',) + flax_prefix + ('BatchNorm_0', 'var'),
    }
