"""Pallas TPU kernel: fused stem GEMV + canvas scatter (VERDICT r4
item 9 — the one named-but-untried flagship lever).

The XLA path (``bev_column_encoder.fused_stem_scatter``) computes
``canvas[dest(v)] += W[sub(v)] @ x[v]`` as a gather of per-voxel weight
slices + one scatter-add — row-count-bound at ~16 ns/row. This kernel
restructures it owner-computes: voxels are pre-sorted by canvas row
(one ``lax.sort_key_val`` in XLA), the kernel grids over canvas x-rows,
and each grid step accumulates its own rows entirely in VMEM — no
HBM scatter.

Mosaic layout notes (see ops/pallas_nms.py and the earlier attempts'
failures, docs/benchmarks.md):
- a [V, C=5] f32 VMEM block pads its lane dim to 128 → 18.4 MB at
  flagship sizing, over the 16 MB scoped-VMEM limit. So the voxel table
  stays in HBM and each grid step DMAs ONLY its own sorted row segment
  (dynamic start on the SUBLANE dim) into a [max_rows, 128] scratch.
- `tpu.memref_slice` rejected both a narrow (·×5) slice of a 128-lane
  memref and (coupled) unaligned dynamic starts, so the table is packed
  to the native 128-lane tile host-side — feats in lanes 0..C-1, the
  (y, sub) metadata as exact small-int floats in lanes C and C+1 — and
  DMA starts are rounded down to the 8-row sublane tile, with the body
  loop offset compensating.
- per-step (1, 2) index blocks violate the sublane-divisibility rule;
  the start/end table rides the scalar-prefetch SMEM operand
  (``PrefetchScalarGridSpec``), which index maps and the body read with
  dynamic scalars.

Measured on v5e (tools/probe_pallas_stem.py) — see docs/benchmarks.md
for the accept/reject record.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(se_ref, table_hbm, w_ref, out_ref, tscr, tsem, *,
                 max_rows: int, C: int, ch0: int):
    """Grid step = one canvas x-row.

    se_ref:    [B·dx, 2] int32 (row start, end) — SMEM (scalar prefetch)
    table_hbm: [V + pad, 128] f32 sorted by dest (HBM): lanes 0..C-1 =
        feats, lane C = y, lane C+1 = sub (exact small-int floats)
    w_ref:     [nsub*C, ch0] f32 (VMEM)  out_ref: [dy, ch0] f32 (VMEM)
    tscr:      [max_rows + 8, 128] f32 VMEM scratch for the segment
    """
    i = pl.program_id(0)
    s = se_ref[i, 0]
    e = se_ref[i, 1]
    s0 = (s // 8) * 8                      # sublane-tile-aligned start
    cp = pltpu.make_async_copy(
        table_hbm.at[pl.dslice(s0, max_rows + 8)], tscr, tsem)
    cp.start()
    out_ref[:, :] = jnp.zeros_like(out_ref)
    cp.wait()

    def body(r, _):
        row = tscr[pl.dslice(r, 1), :]                 # [1, 128]
        y = row[0, C].astype(jnp.int32)
        sub = row[0, C + 1].astype(jnp.int32)
        acc = jnp.zeros((1, ch0), jnp.float32)
        for c in range(C):                              # C is tiny (5)
            wrow = w_ref[pl.dslice(sub * C + c, 1), :]       # [1, ch0]
            acc = acc + row[0, c] * wrow
        cur = out_ref[pl.dslice(y, 1), :]
        out_ref[pl.dslice(y, 1), :] = cur + acc
        return 0

    # dynamic trip count: only this x-row's voxels (total work across the
    # grid = V, not grid·max_rows)
    jax.lax.fori_loop(s - s0, e - s0, body, 0)


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
    # 128-lane packed table (feats | y | sub | zeros), padded so every
    # aligned [s0, s0 + max_rows + 8) DMA window is in bounds. y and
    # sub are < 2^24 — exact as f32.
    table = jnp.concatenate(
        [feats, meta.astype(jnp.float32),
         jnp.zeros((V, 128 - C - 2), jnp.float32)], -1)
    table = jnp.concatenate(
        [table, jnp.zeros((max_rows + 8, 128), jnp.float32)], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch_size * dx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # table (HBM)
            pl.BlockSpec((nsub * C, ch0), lambda i, se_ref: (0, 0)),
        ],
        out_specs=pl.BlockSpec((dy, ch0), lambda i, se_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((max_rows + 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_stem_kernel, max_rows=max_rows, C=C, ch0=ch0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch_size * dx * dy, ch0),
                                       jnp.float32),
        interpret=interpret,
    )(se, table, weight.reshape(nsub * C, ch0).astype(jnp.float32))
    return out.reshape(batch_size, dx, dy, ch0).astype(voxel_features.dtype)
