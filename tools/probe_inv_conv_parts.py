#!/usr/bin/env python
"""Micro-bisect of tile_inverse_conv3d_general (1.1-2.3 s/call at
Part-A2 sizes, probe_sparse_unet_ops.py): which part is pathological —
the J3 contributor gather, the dynamic take_along_axis window selects,
or the lhs-dilated conv?

Run on the real TPU:  python tools/probe_inv_conv_parts.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--To', type=int, default=8192)
    ap.add_argument('--C', type=int, default=64)
    ap.add_argument('--Cout', type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    if os.environ.get('TPU_BEV3D_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['TPU_BEV3D_PLATFORM'])

    # geometry mirroring inv s2->s1: tf=tc=(2,4,4), k=3, s=2, p=1
    tf = tc = (2, 4, 4)
    ks = (3, 3, 3)
    strd = (2, 2, 2)
    pad = (1, 1, 1)
    To = args.To
    T = To // 2
    C, Cout = args.C, args.Cout
    Sc = int(np.prod(tc))
    A = tuple((pad[i] - ks[i] + strd[i]) // strd[i] for i in range(3))
    WL = tuple((tf[i] - 1 + pad[i]) // strd[i] - A[i] + 1
               for i in range(3))
    J = tuple((WL[i] + tc[i] - 2) // tc[i] + 1 for i in range(3))
    J3 = int(np.prod(J))
    print(f'WL={WL} J={J} J3={J3} To={To} T={T} C={C}', flush=True)

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((T + 1, Sc * C)).astype(
        np.float32))
    slots = jnp.asarray(rng.integers(0, T, (J3, To)).astype(np.int32))
    off = jnp.asarray(np.stack(
        [rng.integers(0, tc[i], To) for i in range(3)], -1).astype(
            np.int32))
    wk = jnp.asarray(rng.standard_normal(
        ks + (C, Cout)).astype(np.float32) * 0.05)[::-1, ::-1, ::-1]

    def gather_only(c):
        rows = jnp.take(xp * c, slots.reshape(-1), axis=0)
        return rows

    def to_block(c):
        rows = jnp.take(xp * c, slots.reshape(-1), axis=0)
        block = rows.reshape(J + (To,) + tc + (C,))
        block = jnp.transpose(block, (3, 0, 4, 1, 5, 2, 6, 7)).reshape(
            (To,) + tuple(J[i] * tc[i] for i in range(3)) + (C,))
        return block

    def with_takes(c):
        block = to_block(c)
        for ax in range(3):
            tgt = block.shape[:1 + ax] + (WL[ax],) + block.shape[2 + ax:]
            base = off[:, ax].reshape((To,) + (1,) * (block.ndim - 1))
            idx = base + lax.broadcasted_iota(jnp.int32, tgt, 1 + ax)
            block = jnp.take_along_axis(block, idx, axis=1 + ax)
        return block

    def with_onehot(c):
        block = to_block(c)
        for ax in range(3):
            L = block.shape[1 + ax]
            sel = (off[:, ax, None, None]
                   + jnp.arange(WL[ax])[None, :, None]
                   == jnp.arange(L)[None, None, :])  # [To, WL, L]
            sel = sel.astype(block.dtype)
            block = jnp.moveaxis(block, 1 + ax, -1)
            block = jnp.einsum('t...l,twl->t...w', block, sel)
            block = jnp.moveaxis(block, -1, 1 + ax)
        return block

    def static_take(c):
        """Control: static offset (0) — same shapes, no dynamism."""
        block = to_block(c)
        return block[:, :WL[0], :WL[1], :WL[2]]

    def conv_only(c):
        block = jnp.broadcast_to(
            c, (To,) + WL + (C,)) * jnp.ones((To,) + WL + (C,))
        y = lax.conv_general_dilated(
            block, wk, (1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            lhs_dilation=strd,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return y

    def full_takes(c):
        block = with_takes(c)
        y = lax.conv_general_dilated(
            block, wk, (1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            lhs_dilation=strd,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return y

    def full_onehot(c):
        block = with_onehot(c)
        y = lax.conv_general_dilated(
            block, wk, (1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            lhs_dilation=strd,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return y

    def bench(tag, fn):
        @jax.jit
        def run(c):
            def body(carry, _):
                out = fn(carry)
                return carry + 1e-9 * jnp.sum(jnp.abs(out)), 0
            c2, _ = lax.scan(body, c, None, length=args.reps)
            return c2
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.float32(1.0)))
        ct = time.perf_counter() - t0
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            float(run(jnp.float32(1.0 + 0.1 * r)))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        print(f'  [{tag}] {best*1000:.2f} ms/iter (compile {ct:.0f}s)',
              flush=True)

    bench('gather_only', gather_only)
    bench('to_block', to_block)
    bench('static_take', static_take)
    bench('with_takes', with_takes)
    bench('with_onehot', with_onehot)
    bench('conv_only', conv_only)
    bench('full_takes', full_takes)
    bench('full_onehot', full_onehot)
    # parity: onehot select == take select
    import numpy.testing as npt
    npt.assert_allclose(np.asarray(with_onehot(jnp.float32(1.0))),
                        np.asarray(with_takes(jnp.float32(1.0))),
                        rtol=1e-5, atol=1e-5)
    print('  onehot == takes: OK', flush=True)


if __name__ == '__main__':
    main()
