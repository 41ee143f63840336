"""Per-block DEVICE-time profile of the flagship using the pipelined
protocol: enqueue N executions with distinct inputs, block once. Removes
the ~23 ms tunnel RTT that inflates per-call medians in profile_blocks.py.

Usage: python tools/profile_blocks2.py [--iters 12]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_pipelined(fn, make_args, iters, name):
    import jax
    args = [make_args(i) for i in range(iters)]
    # warmup compile + buffer first-use
    for a in args:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args]
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:28s} {dt * 1e3:8.2f} ms/iter (pipelined x{iters})')
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=12)
    args = ap.parse_args()

    import jax
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    print('device:', jax.devices()[0])

    from __graft_entry__ import _flagship_cfg, _make_batch
    from tpu_bev3d.testing import build_detector_from_cfg

    cfg = _flagship_cfg(tiny=False)
    model = build_detector_from_cfg(cfg.model)
    batch = _make_batch(cfg, batch_size=1, num_points=30000)
    init_fn = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))
    variables = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    host_pts = np.asarray(batch['points'])
    host_img = np.asarray(batch['imgs'])
    results = {}

    # ---- lidar branch: points -> BEV (fused sort-free path) ----
    pts_fn = jax.jit(lambda p, pm: model.apply(
        variables, p, pm, False,
        method=lambda mdl, p, pm, train: mdl.extract_pts_feat(
            p, pm, train=train)))

    def pts_args(i):
        return (jax.device_put(host_pts + np.float32(1e-3 * i)),
                batch['points_mask'])
    results['lidar_branch'] = timeit_pipelined(
        pts_fn, pts_args, args.iters, 'lidar branch (pts->BEV)')

    # ---- camera: swin backbone + neck ----
    import jax.numpy as jnp
    cdt = jnp.dtype(cfg.model.compute_dtype
                    if 'compute_dtype' in cfg.model else 'float32')

    def img_feat(mdl, imgs, train):
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C).astype(cdt)
        feats = mdl._img_backbone(x, train=train)
        feats = mdl._img_neck(feats, train=train)
        return feats[0]
    imgb_fn = jax.jit(lambda im: model.apply(variables, im, False,
                                             method=img_feat))

    def imgb_args(i):
        return (jax.device_put(host_img + np.float32(1e-3 * i)),)
    results['img_backbone_neck'] = timeit_pipelined(
        imgb_fn, imgb_args, args.iters, 'img backbone+neck (swin)')

    f0 = imgb_fn(batch['imgs'])
    jax.block_until_ready(f0)

    # ---- view transform ----
    cam_keys = ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                'lidar2img')

    def vt(mdl, f, batch_in, train):
        B, N = batch_in['imgs'].shape[:2]
        fh, fw, fc = f.shape[1:]
        fr = f.reshape(B, N, fh, fw, fc)
        cam_params = {k: batch_in[k] for k in cam_keys if k in batch_in}
        if 'lidar_aug' in batch_in:
            cam_params['lidar_aug'] = batch_in['lidar_aug']
        bev, _ = mdl._view_transform(fr, cam_params,
                                     points=batch_in.get('points'),
                                     points_mask=batch_in.get('points_mask'),
                                     train=train)
        return bev
    vt_fn = jax.jit(lambda f, b: model.apply(variables, f, b, False,
                                             method=vt))

    def vt_args(i):
        return (f0 + np.float32(1e-3 * i), batch)
    results['view_transform'] = timeit_pipelined(
        vt_fn, vt_args, args.iters, 'view transform (LSS+pool)')

    bev_img = vt_fn(f0, batch)
    pts_bev = pts_fn(batch['points'], batch['points_mask'])
    jax.block_until_ready((bev_img, pts_bev))

    # ---- fuser + BEV backbone + neck + head fwd + decode ----
    def tail(mdl, a, b_, train):
        x = mdl._fuser([a.astype(cdt), b_], train=train)
        x = mdl._backbone(x, train=train)
        x = mdl._neck(x, train=train)
        res = mdl._bbox_head(x.astype(jnp.float32), train=train)
        return mdl._bbox_head.predict_by_feat(res)
    tail_fn = jax.jit(lambda a, b_: model.apply(variables, a, b_, False,
                                                method=tail))

    def tail_args(i):
        return (bev_img + np.float32(1e-3 * i), pts_bev)
    results['fuse_backbone_head'] = timeit_pipelined(
        tail_fn, tail_args, args.iters, 'fuser+SECOND+FPN+head+decode')

    # ---- full ----
    full_fn = jax.jit(lambda v, b: model.apply(v, b, mode='predict',
                                               train=False))

    def full_args(i):
        b = dict(batch)
        b['points'] = jax.device_put(host_pts + np.float32(1e-3 * i))
        return (variables, b)
    results['full_predict'] = timeit_pipelined(
        full_fn, full_args, args.iters, 'FULL model predict')

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == '__main__':
    main()
