#!/usr/bin/env python
"""Prototype: BEV-pool scatter as counting-partition + one-hot GEMM.

The flagship's largest single op is the LSS lift/pool scatter
(vt_pool 12.4 ms, of which the raw XLA scatter-add is ~6.8 ms at
R=405k rows x C=80 into 360^2 cells — tools/probe_vt_parts.py).
Scatter-add with duplicate indices is inherently serial per conflict on
vector hardware; this probe measures reformulating it as:

  1. counting-partition (NO sort): bucket = rank // T (T cells per
     BEV tile); per-row position via one-hot cumsum; rows scattered
     once (a PERMUTATION — unique indices) into a bucket-grouped,
     chunk-aligned layout.
  2. per-chunk one-hot GEMM on the MXU: out_tile[T, C] +=
     onehot[T, CH] @ rows[CH, C] — the accumulation happens inside the
     MXU's systolic reduction instead of a serialized scatter.

Variants measured (flagship shapes, carry-perturbed RANKS so the
partition cannot hoist out of the scan):
  scatter      baseline .at[].add (what bev_pool does today)
  gemm_xla     partition + materialized one-hot einsum + segment_sum
  gemm_pallas  partition + Pallas kernel (one-hot built in VMEM,
               output tile revisited across chunks of one bucket)

Run on TPU: python tools/probe_pool_gemm.py
CPU check:   TPU_BEV3D_PLATFORM=cpu python tools/probe_pool_gemm.py \
                 --check --reps 2 --rows 4096

MEASURED (v5e, 2026-08-18, flagship shapes R=405504 C=80 cells=129600):
  scatter        6.1 ms   <- baseline .at[].add (bev_pool today)
  gemm_xla      22.3 ms   (963 MB materialized one-hot)
  gemm_pallas   10.7 ms   (XLA cumsum partition 8.4 + kernel)
  gemm_pallas2   7.7 ms   (tri-matmul partition 3.8 + kernel 1.5)
  pieces: pos via tri-matmul 1.1 (vs 3.6 XLA cumsum); row GATHER of
  the permuted payload 0.7 (vs 5.1 for the same-width row SCATTER —
  gathers are the fast direction on TPU); Pallas one-hot GEMM 1.5.
CONCLUSION: the one-hot-GEMM pool loses to the plain XLA scatter-add
end to end — every partition formulation pays >=2 ms of glue traffic
(cmp/run materialization + inverse-perm + off gathers) on top of the
1.5 ms kernel. The XLA scatter stays. Kept as the measured record and
for the reusable pieces (MXU triangular-matmul running counts; the
revisited-output one-hot GEMM kernel pattern).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=16)
    ap.add_argument('--rows', type=int, default=405504)
    ap.add_argument('--cells', type=int, default=129600)
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()
    REPS = args.reps

    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(root, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C, CELLS = args.rows, 80, args.cells
    T, CH = 1024, 512
    NB = -(-(CELLS + 1) // T)              # +1: drop rank CELLS
    RCAP = R + NB * CH                     # every bucket >=1 chunk
    NC = RCAP // CH
    rng = np.random.default_rng(0)

    # clustered plausible ranks (center-heavy like a real frame)
    rank0 = np.clip((rng.standard_normal(R) * 20000 + CELLS // 2),
                    0, CELLS - 1).astype(np.int32)
    rankf0 = jnp.asarray(rank0.astype(np.float32))
    u0 = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32),
                     jnp.bfloat16)

    def scatter_pool(rank, u):
        out = jnp.zeros((CELLS + T, C), jnp.float32)
        return out.at[rank].add(u.astype(jnp.float32),
                                mode='drop')[:CELLS]

    def partition(rank, u):
        """-> u_part [RCAP, C], off_part [NC, CH], chunk_bucket [NC],
        first_visit [NC]."""
        bucket = rank // T
        iota_b = jnp.arange(NB, dtype=jnp.int32)
        cmp = bucket[:, None] == iota_b[None, :]            # [R, NB]
        cnt_c = jnp.cumsum(cmp.astype(jnp.int32), axis=0)   # [R, NB]
        pos = jnp.sum(jnp.where(cmp, cnt_c, 0), -1) - 1     # [R]
        counts = cnt_c[-1]                                  # [NB]
        pc = jnp.maximum((counts + CH - 1) // CH, 1) * CH
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(pc)[:-1].astype(jnp.int32)])
        dest = jnp.sum(jnp.where(cmp, starts[None, :], 0), -1) + pos
        u_part = jnp.zeros((RCAP, C), u.dtype).at[dest].set(
            u, mode='drop', unique_indices=True)
        off = rank - bucket * T
        # padded rows keep off=-1 -> one-hot all-zero
        off_part = jnp.full((RCAP,), -1, jnp.int32).at[dest].set(
            off, mode='drop', unique_indices=True)
        chunk_bucket = jnp.searchsorted(
            starts, jnp.arange(NC, dtype=jnp.int32) * CH, side='right'
        ).astype(jnp.int32) - 1
        first = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (chunk_bucket[1:] != chunk_bucket[:-1]).astype(jnp.int32)])
        return u_part, off_part.reshape(NC, CH), chunk_bucket, first

    def gemm_xla(rank, u):
        u_part, off3, cb, _ = partition(rank, u)
        u3 = u_part.reshape(NC, CH, C)
        iota_t = jnp.arange(T, dtype=jnp.int32)
        oh = (iota_t[None, :, None] == off3[:, None, :]).astype(u.dtype)
        outs = jnp.einsum('ntl,nlc->ntc', oh, u3,
                          preferred_element_type=jnp.float32)
        tiles = jax.ops.segment_sum(outs.reshape(NC, T * C), cb,
                                    num_segments=NB,
                                    indices_are_sorted=True)
        return tiles.reshape(NB * T, C)[:CELLS]

    def _kernel(cb_ref, fv_ref, off_ref, u_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(fv_ref[i] == 1)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        oh = (jax.lax.broadcasted_iota(jnp.int32, (T, CH), 0)
              == off_ref[0]).astype(jnp.bfloat16)
        out_ref[0] += jax.lax.dot(oh, u_ref[:],
                                  preferred_element_type=jnp.float32)

    def gemm_pallas(rank, u):
        u_part, off3, cb, fv = partition(rank, u)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NC,),
            in_specs=[
                # off as [NC, 1, CH]: block sublane dim must be divisible
                # by 8 or equal the array dim -- (1, 1, CH) qualifies
                pl.BlockSpec((1, 1, CH), lambda i, cb, fv: (i, 0, 0)),
                pl.BlockSpec((CH, C), lambda i, cb, fv: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, C),
                                   lambda i, cb, fv: (cb[i], 0, 0)),
        )
        tiles = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, T, C), jnp.float32),
            interpret=args.interpret,
        )(cb, fv, off3[:, None, :], u_part)
        return tiles.reshape(NB * T, C)[:CELLS]

    G = R // CH
    tri_b = jnp.tril(jnp.ones((CH, CH), jnp.bfloat16))

    def partition2(rank, u):
        """All-gather/matmul partition: positions via triangular-matmul
        running counts on the MXU; payload moved by row GATHER through a
        tiny int32 inverse-permutation scatter (row scatters of wide
        payloads measured 5.2 ms vs 0.36 ms for the same-width gather)."""
        bucket = (rank // T).reshape(G, CH)
        iota_b = jnp.arange(NB, dtype=jnp.int32)
        cmp = bucket[..., None] == iota_b[None, None, :]     # [G,CH,NB]
        cmpb = cmp.astype(jnp.bfloat16)
        run = jnp.einsum('ij,gjb->gib', tri_b, cmpb,
                         preferred_element_type=jnp.float32)  # [G,CH,NB]
        gcnt = run[:, -1, :]                                  # [G,NB]
        counts = jnp.sum(gcnt, 0).astype(jnp.int32)           # [NB]
        base_g = (jnp.cumsum(gcnt, 0) - gcnt)                 # excl [G,NB]
        pc = jnp.maximum((counts + CH - 1) // CH, 1) * CH
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(pc)[:-1].astype(jnp.int32)])
        posb = jnp.sum(jnp.where(cmp, run + base_g[:, None, :], 0.), -1)
        sb = jnp.sum(jnp.where(cmp, starts[None, None, :]
                               .astype(jnp.float32), 0.), -1)
        dest = (posb - 1 + sb).astype(jnp.int32).reshape(R)
        inv = jnp.full((RCAP,), R, jnp.int32).at[dest].set(
            jnp.arange(R, dtype=jnp.int32), mode='drop',
            unique_indices=True)
        u_part = jnp.concatenate([u, jnp.zeros((1, C), u.dtype)], 0)[inv]
        off = (rank - (rank // T) * T).astype(jnp.int32)
        off_part = jnp.concatenate(
            [off, jnp.full((1,), -1, jnp.int32)])[inv]
        chunk_bucket = jnp.searchsorted(
            starts, jnp.arange(NC, dtype=jnp.int32) * CH, side='right'
        ).astype(jnp.int32) - 1
        first = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (chunk_bucket[1:] != chunk_bucket[:-1]).astype(jnp.int32)])
        return u_part, off_part.reshape(NC, CH), chunk_bucket, first

    def gemm_pallas2(rank, u):
        u_part, off3, cb, fv = partition2(rank, u)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NC,),
            in_specs=[
                pl.BlockSpec((1, 1, CH), lambda i, cb, fv: (i, 0, 0)),
                pl.BlockSpec((CH, C), lambda i, cb, fv: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, C),
                                   lambda i, cb, fv: (cb[i], 0, 0)),
        )
        tiles = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, T, C), jnp.float32),
            interpret=args.interpret,
        )(cb, fv, off3[:, None, :], u_part)
        return tiles.reshape(NB * T, C)[:CELLS]


    if args.check:
        r_np = np.asarray(rankf0).astype(np.int32)
        ref = np.asarray(scatter_pool(jnp.asarray(r_np), u0))
        for name, fn in [('gemm_xla', gemm_xla),
                         ('gemm_pallas', gemm_pallas),
                         ('gemm_pallas2', gemm_pallas2)]:
            got = np.asarray(jax.jit(fn)(jnp.asarray(r_np), u0))
            err = np.abs(got - ref).max()
            print(f'{name:12s} max|err| = {err:.3e} '
                  f'(sum {got.sum():.3f} vs {ref.sum():.3f})')
            assert err < 1e-2, name
        print('CHECK OK')
        return

    def timed(name, fn):
        def run(x0):
            def body(c, _):
                s = c
                # perturb the RANKS each rep: in the real model ranks are
                # data-dependent (top-k bins), so the partition must not
                # hoist out of the scan
                rank = ((rankf0 + s).astype(jnp.int32)) % CELLS
                y = fn(rank, u0)
                acc = jnp.sum(jnp.abs(y).astype(jnp.float32)) * 1e-20
                return s + 1.0 + acc, 0
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return s
        jf = jax.jit(run)
        jax.block_until_ready(jf(jnp.float32(0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(jnp.float32(0)))
            best = min(best, (time.perf_counter() - t0) * 1000)
        print(f'{name:14s} {(best - 23) / REPS:8.2f} ms/op   '
              f'(total {best:.0f} ms, {REPS} reps)', flush=True)

    timed('scatter', scatter_pool)
    timed('gemm_xla', gemm_xla)
    timed('gemm_pallas', gemm_pallas)
    timed('gemm_pallas2', gemm_pallas2)
    timed('partition2', lambda r, u: partition2(r, u)[0])

    # bisect: partition alone (checksum via one payload column), and the
    # Pallas kernel alone on FIXED pre-partitioned inputs (fresh payload
    # values per rep so the GEMM itself can't fold)
    timed('partition', lambda rank, u: partition(rank, u)[0][:, :1])

    def pos_only(rank, u):
        bucket = rank // T
        iota_b = jnp.arange(NB, dtype=jnp.int32)
        cmp = bucket[:, None] == iota_b[None, :]
        cnt_c = jnp.cumsum(cmp.astype(jnp.int32), axis=0)
        pos = jnp.sum(jnp.where(cmp, cnt_c, 0), -1) - 1
        return pos
    timed('pos_cumsum', pos_only)

    # permutation scatter alone (fixed plausible dest)
    dest0 = jax.jit(lambda r: jnp.sum(jnp.where(
        (r // T)[:, None] == jnp.arange(NB)[None, :],
        jnp.cumsum(((r // T)[:, None] == jnp.arange(NB)[None, :])
                   .astype(jnp.int32), axis=0), 0), -1) - 1)(
        jnp.asarray(rank0))

    def permute_only(rank, u):
        d = (dest0 + rank[0] * 0) % RCAP
        up = jnp.zeros((RCAP, C), u.dtype).at[d].set(
            u, mode='drop', unique_indices=True)
        return up
    timed('permute_u', permute_only)

    # triangular-matmul position computation (cumsum on the MXU)
    G = R // CH
    tri = jnp.tril(jnp.ones((CH, CH), jnp.bfloat16))

    def pos_trimm(rank, u):
        bucket = (rank // T).reshape(G, CH)
        iota_b = jnp.arange(NB, dtype=jnp.int32)
        cmp = (bucket[..., None] == iota_b[None, None, :])  # [G,CH,NB]
        cmpb = cmp.astype(jnp.bfloat16)
        # inclusive within-group running count, on the MXU
        run = jnp.einsum('ij,gjb->gib', tri, cmpb,
                         preferred_element_type=jnp.float32)
        gcnt = run[:, -1, :]                                # [G,NB]
        base = jnp.cumsum(gcnt, axis=0) - gcnt              # excl over G
        posl = jnp.sum(jnp.where(cmp, run, 0), -1)          # [G,CH]
        basel = jnp.sum(jnp.where(cmp, base[:, None, :], 0), -1)
        return (posl + basel - 1).astype(jnp.int32)
    timed('pos_trimm', pos_trimm)

    # gather formulation of the permutation: inverse perm via tiny int32
    # scatter, then row-GATHER of the payload (no write conflicts)
    def gather_u(rank, u):
        d = (dest0 + rank[0] * 0) % RCAP
        inv = jnp.full((RCAP,), R, jnp.int32).at[d].set(
            jnp.arange(R, dtype=jnp.int32), mode='drop',
            unique_indices=True)
        up = jnp.concatenate([u, jnp.zeros((1, C), u.dtype)], 0)[inv]
        return up
    timed('gather_u', gather_u)

    def gather_u_fill(rank, u):
        d = (dest0 + rank[0] * 0) % RCAP
        inv = jnp.full((RCAP,), R, jnp.int32).at[d].set(
            jnp.arange(R, dtype=jnp.int32), mode='drop',
            unique_indices=True)
        up = jnp.take(u, inv, axis=0, mode='fill', fill_value=0)
        return up
    timed('gather_u_fill', gather_u_fill)

    up0, off0, cb0, fv0 = jax.jit(partition)(
        jnp.asarray(rank0), u0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 1, CH), lambda i, cb, fv: (i, 0, 0)),
            pl.BlockSpec((CH, C), lambda i, cb, fv: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, C),
                               lambda i, cb, fv: (cb[i], 0, 0)),
    )

    def pallas_only(rank, u):
        up = up0 + (rank[0].astype(jnp.bfloat16) * 0)  # dep on rank arg
        up = up + u[0, 0] * 0
        tiles = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NB, T, C), jnp.float32),
        )(cb0, fv0, off0[:, None, :], up)
        return tiles.reshape(NB * T, C)[:CELLS]
    timed('pallas_only', pallas_only)


if __name__ == '__main__':
    main()
