"""Pallas TPU kernel: greedy NMS suppression scan in VMEM.

The XLA version (ops/nms._greedy_scan) runs an N-step ``fori_loop`` where
every step reads a column of the [N, N] suppression matrix — N sequential
dispatches over HBM. Here the whole matrix (≤1024² f32 = 4 MB) sits in
VMEM and the scan runs inside one kernel: no per-step HBM roundtrips.

Gated: used automatically on TPU backends unless TPU_BEV3D_NO_PALLAS=1;
tests run it in interpreter mode on CPU (same code path).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _nms_scan_kernel(suppress_ref, valid_ref, keep_ref):
    """Row formulation (2D refs only — Mosaic tiling wants the lane dim):
    for i ascending, if i survives, it kills every worse j it suppresses."""
    n = suppress_ref.shape[0]
    keep_ref[:, :] = valid_ref[:, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, _):
        row = suppress_ref[pl.dslice(i, 1), :]            # [1, n]
        # scalar "is i still alive" via masked reduction — Mosaic rejects
        # dynamic slicing on the lane (minor) dimension
        alive = jnp.max(jnp.where(idx == i, keep_ref[:, :], 0))
        kill = (row > 0) & (idx > i) & (alive > 0)
        keep_ref[:, :] = jnp.where(kill, 0, keep_ref[:, :])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def greedy_scan_pallas(suppress, valid, interpret: bool = False):
    """suppress [N, N] bool; valid [N] bool → keep [N] bool. Same contract
    as ops/nms._greedy_scan (score-descending order assumed). N is padded
    to a lane multiple internally."""
    n = suppress.shape[0]
    np_ = -(-n // 128) * 128
    sup = jnp.zeros((np_, np_), jnp.int32).at[:n, :n].set(
        suppress.astype(jnp.int32))
    val = jnp.zeros((1, np_), jnp.int32).at[0, :n].set(
        valid.astype(jnp.int32))
    out = pl.pallas_call(
        _nms_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.int32),
        interpret=interpret,
    )(sup, val)
    return out[0, :n] > 0


def use_pallas() -> bool:
    # validated on v5e (matches the XLA scan bit-exactly); opt out with
    # TPU_BEV3D_NO_PALLAS=1
    if os.environ.get('TPU_BEV3D_NO_PALLAS') == '1':
        return False
    return jax.default_backend() == 'tpu'
