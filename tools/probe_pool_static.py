"""Probe: static-plan gather pool vs the dynamic scatter lift+pool.

Flagship-scale LSS shapes (N=6 cams, 32x88 features, D=118 bins, C=80,
360^2 BEV) with REAL rig geometry from the vendored nuScenes demo frame.
Times three formulations inside the trustworthy scan-chained protocol
(docs/benchmarks.md — separately-jitted per-block calls are garbage on
the tunnel):

  scatter_topk24 : production path today — lax.top_k(24) + renorm +
                   outer product + dynamic scatter-add (ops/bev_pool.py)
  scatter_exact  : all-118-bin outer product + scatter (the faithful
                   config's path, depth_topk=0)
  static_exact   : bev_pool_static — constant bucketed gathers + einsum,
                   exact all-bins semantics, no sort/scatter

Run on the TPU:  python tools/probe_pool_static.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg, _make_real_batch
    from tpu_bev3d.models.view_transforms.depth_lss import DepthLSSTransform
    from tpu_bev3d.ops.bev_pool import bev_pool, compute_flat_ranks
    from tpu_bev3d.ops.bev_pool_static import (bev_pool_static,
                                               build_pool_plan_from_ranks)

    cfg = _flagship_cfg()
    batch = _make_real_batch(cfg)
    assert batch is not None, 'vendored real frame required'
    vt = DepthLSSTransform(**{k: v for k, v in
                              cfg.model.view_transform.items()
                              if k != 'type'})
    cam = dict(cam2lidar=batch['cam2lidar'], intrins=batch['intrins'],
               post_rots=batch['post_rots'], post_trans=batch['post_trans'],
               lidar_aug=batch.get('lidar_aug'))
    N, fH, fW = 6, vt.feature_size[0], vt.feature_size[1]
    D, C = vt.D, vt.out_channels
    nx, ny, nz = vt.bev_shape
    START = (vt.xbound[0], vt.ybound[0], vt.zbound[0])
    STEP = (vt.xbound[2], vt.ybound[2], vt.zbound[2])

    geom = jax.jit(lambda c: vt.get_geometry(
        c['cam2lidar'], c['intrins'], c['post_rots'], c['post_trans'],
        c['lidar_aug']))(cam)
    t0 = time.perf_counter()
    ranks = np.asarray(compute_flat_ranks(geom, START, STEP,
                                          (nx, ny, nz)))[0]
    plan = build_pool_plan_from_ranks(ranks, n_cells=nx * ny * nz,
                                      N=N, D=D, fH=fH, fW=fW)
    print(f'plan build: {time.perf_counter() - t0:.2f}s  meta='
          f'{plan["meta"]}')

    rng = np.random.default_rng(0)
    n_frames = 16
    dl = jnp.asarray(rng.standard_normal(
        (n_frames, 1, N, fH, fW, D)).astype(np.float32) * 2)
    ft = jnp.asarray(rng.standard_normal(
        (n_frames, 1, N, fH, fW, C)).astype(np.float32)).astype(jnp.bfloat16)

    def scatter_path(depth_logits, feats, k):
        depth = jax.nn.softmax(depth_logits, -1)
        if k:
            topv, topi = jax.lax.top_k(depth, k)
            topv = topv / jnp.maximum(jnp.sum(topv, -1, keepdims=True),
                                      1e-6)
            frustum = topv[..., None].astype(feats.dtype) \
                * feats[..., None, :]
            g = jnp.transpose(geom, (0, 1, 3, 4, 2, 5))
            g = jnp.take_along_axis(g, topi[..., None], axis=4)
        else:
            frustum = jnp.einsum('bnhwd,bnhwc->bndhwc',
                                 depth.astype(feats.dtype), feats)
            g = geom
        return bev_pool(frustum, g, bev_start=START, bev_interval=STEP,
                        bev_shape=(nx, ny, nz), accum_dtype=jnp.float32)

    def static_path(depth_logits, feats):
        depth = jax.nn.softmax(depth_logits, -1)
        return bev_pool_static(depth, feats, plan, bev_shape=(nx, ny, nz))

    def static_prod(depth_logits, feats):
        # materialize the weighted rows in LATTICE order (sequential
        # write, no gather — the scalar weights are consumed by a
        # broadcast multiply), then only ROW gathers remain
        depth = jax.nn.softmax(depth_logits, -1)
        B = depth.shape[0]
        prod = depth[..., None].astype(feats.dtype) \
            * feats[..., None, :]                # [B,N,fH,fW,D,C]
        rows = jnp.concatenate(
            [prod.reshape(B, -1, C),
             jnp.zeros((B, 1, C), feats.dtype)], 1)
        parts = [jnp.einsum('bmkc->bmc', rows[:, w_idx],
                            preferred_element_type=jnp.float32)
                 for w_idx, _ in plan['classes']]
        parts.append(jnp.zeros((B, 1, C), jnp.float32))
        allp = jnp.concatenate(parts, 1)
        canvas = allp[:, plan['inv_map']]
        return canvas.reshape(B, nz, nx, ny, C)

    def static_wonly(depth_logits, feats):
        # isolation: scalar weight gather + reduce only
        depth = jax.nn.softmax(depth_logits, -1)
        B = depth.shape[0]
        wf = jnp.concatenate([depth.reshape(B, -1),
                              jnp.zeros((B, 1), depth.dtype)], -1)
        return jnp.concatenate(
            [jnp.sum(wf[:, w_idx], -1) for w_idx, _ in plan['classes']], 1)

    def static_fonly(depth_logits, feats):
        # isolation: feature row gather + reduce only
        B = feats.shape[0]
        ff = feats.reshape(B, -1, C)
        parts = [jnp.einsum('bmkc->bmc', ff[:, f_idx],
                            preferred_element_type=jnp.float32)
                 for _, f_idx in plan['classes']]
        return jnp.concatenate(parts, 1)

    # --- decomposition of the top-k scatter path -------------------------
    def scatter_bf16accum(depth_logits, feats):
        depth = jax.nn.softmax(depth_logits, -1)
        topv, topi = jax.lax.top_k(depth, 24)
        topv = topv / jnp.maximum(jnp.sum(topv, -1, keepdims=True), 1e-6)
        frustum = topv[..., None].astype(feats.dtype) * feats[..., None, :]
        g = jnp.transpose(geom, (0, 1, 3, 4, 2, 5))
        g = jnp.take_along_axis(g, topi[..., None], axis=4)
        return bev_pool(frustum, g, bev_start=START, bev_interval=STEP,
                        bev_shape=(nx, ny, nz),
                        accum_dtype=jnp.bfloat16).astype(jnp.float32)

    def topk_outer_only(depth_logits, feats):
        depth = jax.nn.softmax(depth_logits, -1)
        topv, topi = jax.lax.top_k(depth, 24)
        topv = topv / jnp.maximum(jnp.sum(topv, -1, keepdims=True), 1e-6)
        frustum = topv[..., None].astype(feats.dtype) * feats[..., None, :]
        return jnp.sum(frustum, (-2, -1)) + jnp.sum(topi)

    def geomgather_only(depth_logits, feats):
        depth = jax.nn.softmax(depth_logits, -1)
        _, topi = jax.lax.top_k(depth, 24)
        g = jnp.transpose(geom, (0, 1, 3, 4, 2, 5))
        g = jnp.take_along_axis(g, topi[..., None], axis=4)
        return jnp.sum(g)

    def scatter_only(depth_logits, feats):
        # realistic rank pattern: static real geometry ranks gathered at
        # the top-k bins, rows = plain feats broadcast (no outer product)
        depth = jax.nn.softmax(depth_logits, -1)
        _, topi = jax.lax.top_k(depth, 24)
        rk = jnp.asarray(ranks.reshape(N, D, fH, fW)).transpose(0, 2, 3, 1)
        r = jnp.take_along_axis(rk[None], topi, axis=-1)
        rows = jnp.broadcast_to(feats[..., None, :],
                                feats.shape[:-1] + (24, C))
        B = feats.shape[0]
        out = jnp.zeros((B, nx * ny * nz + 1, C), jnp.float32)
        out = out.at[jnp.arange(B)[:, None],
                     jnp.minimum(r.reshape(B, -1), nx * ny * nz)].add(
            rows.reshape(B, -1, C).astype(jnp.float32))
        return jnp.sum(out)

    def fused_sort(depth_logits, feats, k):
        # rank selection fused into the top-k SORT: sort (-depth, rank)
        # pairs along D, take a STATIC [:k] slice — no minor-axis gather
        depth = jax.nn.softmax(depth_logits, -1)
        rk = jnp.asarray(ranks.reshape(N, D, fH, fW)).transpose(0, 2, 3, 1)
        B = depth.shape[0]
        rkb = jnp.broadcast_to(rk[None], depth.shape)
        negd, rsel = jax.lax.sort_key_val(-depth, rkb, dimension=-1)
        topv = -negd[..., :k]
        rsel = rsel[..., :k]
        topv = topv / jnp.maximum(jnp.sum(topv, -1, keepdims=True), 1e-6)
        rows = topv[..., None].astype(feats.dtype) * feats[..., None, :]
        out = jnp.zeros((B, nx * ny * nz + 1, C), jnp.float32)
        out = out.at[jnp.arange(B)[:, None],
                     jnp.minimum(rsel.reshape(B, -1), nx * ny * nz)].add(
            rows.reshape(B, -1, C).astype(jnp.float32))
        return out[:, :-1]

    def sort_only(depth_logits, feats):
        depth = jax.nn.softmax(depth_logits, -1)
        rk = jnp.asarray(ranks.reshape(N, D, fH, fW)).transpose(0, 2, 3, 1)
        rkb = jnp.broadcast_to(rk[None], depth.shape)
        negd, rsel = jax.lax.sort_key_val(-depth, rkb, dimension=-1)
        return jnp.sum(negd[..., :24]) + jnp.sum(rsel[..., :24])

    cases = {
        'fused_sort_topk24': lambda d, f: jnp.sum(fused_sort(d, f, 24)),
        'fused_sort_topk16': lambda d, f: jnp.sum(fused_sort(d, f, 16)),
        'fused_sort_topk8': lambda d, f: jnp.sum(fused_sort(d, f, 8)),
        'sort_only': sort_only,
        'scatter_topk24': lambda d, f: scatter_path(d, f, 24),
        'scatter_exact': lambda d, f: scatter_path(d, f, 0),
        'static_exact': static_path,
        'static_prod': static_prod,
        'static_wonly': static_wonly,
        'static_fonly': static_fonly,
        'scatter_bf16accum': scatter_bf16accum,
        'topk_outer_only': topk_outer_only,
        'geomgather_only': geomgather_only,
        'scatter_only': scatter_only,
    }
    if os.environ.get('PROBE_ONLY'):
        keep = os.environ['PROBE_ONLY'].split(',')
        cases = {k: v for k, v in cases.items() if k in keep}
    for name, fn in cases.items():
        @jax.jit
        def run(dl, ft, fn=fn):
            def body(acc, xs):
                out = fn(xs[0], xs[1])
                return acc + jnp.sum(jnp.abs(out)), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0), (dl, ft))
            return acc
        _ = float(run(dl, ft))
        reps = []
        for r in range(3):
            d2 = dl + np.float32(0.001 * (r + 1))
            t0 = time.perf_counter()
            _ = float(run(d2, ft))
            reps.append((time.perf_counter() - t0) / n_frames * 1e3)
        print(f'{name:16s} {min(reps):7.2f} ms/frame  (reps '
              f'{[round(x, 2) for x in reps]})')


if __name__ == '__main__':
    main()
