"""Pallas TPU kernel: fused stem GEMV + canvas scatter (VERDICT r4
item 9 — the one named-but-untried flagship lever).

The XLA path (``bev_column_encoder.fused_stem_scatter``) computes
``canvas[dest(v)] += W[sub(v)] @ x[v]`` as a gather of per-voxel weight
slices + one scatter-add — row-count-bound at ~16 ns/row. This kernel
restructures it owner-computes: voxels are pre-sorted by canvas row
(one ``lax.sort_key_val`` in XLA), the kernel grids over canvas x-rows,
and each grid step accumulates its own rows entirely in VMEM — no
HBM scatter.

Layout notes (Mosaic rules, see ops/pallas_nms.py): the output block is
[dy, ch0] so the dynamic per-voxel store lands on the SUBLANE dim
(lane-dim dynamic slicing is rejected); per-voxel scalars (y, sub,
count) are read with [1,1] sublane loads + squeeze.

Measured on v5e (tools/probe_pallas_stem.py) — see docs/benchmarks.md
for the accept/reject record.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _stem_kernel(start_ref, feats_ref, meta_ref, w_ref, out_ref, *,
                 max_rows: int, C: int, ch0: int):
    """Grid step = one canvas x-row.

    start_ref: [1, 2] int32 (row start, row end) for this x (VMEM)
    feats_ref: [V, C] f32 sorted by dest    meta_ref: [V, 2] int32 (y, sub)
    w_ref:     [nsub*C, ch0] f32            out_ref: [dy, ch0] f32
    """
    out_ref[:, :] = jnp.zeros_like(out_ref)
    s = start_ref[0, 0]
    e = start_ref[0, 1]

    def body(r, _):
        y = meta_ref[pl.dslice(r, 1), 0][0]
        sub = meta_ref[pl.dslice(r, 1), 1][0]
        x = feats_ref[pl.dslice(r, 1), :]              # [1, C]
        acc = jnp.zeros((1, ch0), jnp.float32)
        for c in range(C):                              # C is tiny (5)
            wrow = w_ref[pl.dslice(sub * C + c, 1), :]       # [1, ch0]
            acc = acc + x[0, c] * wrow
        cur = out_ref[pl.dslice(y, 1), :]
        out_ref[pl.dslice(y, 1), :] = cur + acc
        return 0

    # dynamic trip count: only this x-row's voxels (total work across the
    # grid = V, not grid·max_rows)
    jax.lax.fori_loop(s, e, body, 0)


@functools.partial(jax.jit, static_argnames=(
    'batch_size', 'nz', 'ny', 'nx', 'pack_xy', 'max_rows', 'interpret'))
def pallas_stem_scatter(voxel_features, coords, weight, *, batch_size: int,
                        nz: int, ny: int, nx: int, pack_xy: int,
                        max_rows: int = 2048, interpret: bool = False):
    """Drop-in twin of ``fused_stem_scatter`` (same contract/output):
    [V, C] feats + [V, 4] coords + [nsub, C, ch0] weight →
    [B, dx, dy, ch0]. ``max_rows`` bounds the per-canvas-x voxel count
    (rows beyond it drop — size from data like the tile capacities).
    """
    V, C = voxel_features.shape
    p = pack_xy
    dx, dy = (nx + p - 1) // p, (ny + p - 1) // p
    nsub = nz * p * p
    ch0 = weight.shape[-1]
    valid = coords[:, 0] >= 0
    b, z, y, x = (coords[:, i] for i in range(4))
    qx, rx = x // p, x % p
    qy, ry = y // p, y % p
    sub = z * (p * p) + rx * p + ry    # == fused_stem_scatter's sub order
    # destination key: (batch, canvas x) row-major; invalid → end
    key = jnp.where(valid, (b * dx + qx), batch_size * dx)
    order = jnp.argsort(key)
    skey = key[order]
    feats = voxel_features[order].astype(jnp.float32)
    meta = jnp.stack([qy[order], sub[order]], -1).astype(jnp.int32)
    meta = jnp.where(valid[order][:, None], meta, 0)
    feats = jnp.where(valid[order][:, None], feats, 0.0)
    rows = jnp.arange(batch_size * dx, dtype=jnp.int32)
    starts = jnp.searchsorted(skey, rows).astype(jnp.int32)
    ends = jnp.searchsorted(skey, rows + 1).astype(jnp.int32)
    ends = jnp.minimum(ends, starts + max_rows)
    se = jnp.stack([starts, ends], -1)                      # [B·dx, 2]

    out = pl.pallas_call(
        functools.partial(_stem_kernel, max_rows=max_rows, C=C, ch0=ch0),
        grid=(batch_size * dx,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i, 0)),
            pl.BlockSpec((V, C), lambda i: (0, 0)),
            pl.BlockSpec((V, 2), lambda i: (0, 0)),
            pl.BlockSpec((nsub * C, ch0), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((dy, ch0), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch_size * dx * dy, ch0),
                                       jnp.float32),
        interpret=interpret,
    )(se, feats, meta, weight.reshape(nsub * C, ch0).astype(jnp.float32))
    return out.reshape(batch_size, dx, dy, ch0).astype(voxel_features.dtype)
