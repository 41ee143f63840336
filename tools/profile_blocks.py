"""Per-block latency profile of the flagship BEVFusion L+C pipeline.

Times each stage as its own jitted function on the current default device.
Tunnel-safe protocol (CLAUDE.md): DISTINCT inputs per iteration + host
readback of a reduction every step; median over iterations reported.

Usage: python tools/profile_blocks.py [--iters 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, make_args, iters, name):
    import jax
    import jax.numpy as jnp
    args0 = make_args(0)
    out = fn(*args0)
    jax.block_until_ready(out)
    ts = []
    for i in range(1, iters + 1):
        args = make_args(i)
        for a in jax.tree_util.tree_leaves(args):
            if hasattr(a, 'block_until_ready'):
                a.block_until_ready()
        t0 = time.perf_counter()
        out = fn(*args)
        # host readback of a reduction forces real execution on the tunnel
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
        assert s == s or True
    ts.sort()
    med = ts[len(ts) // 2]
    print(f'{name:28s} median {med * 1e3:8.2f} ms  (min {min(ts)*1e3:.2f})')
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    print('device:', jax.devices()[0])

    from __graft_entry__ import _flagship_cfg, _make_batch
    from tpu_bev3d.testing import build_detector_from_cfg
    from tpu_bev3d.ops.voxelize import batch_hard_voxelize

    cfg = _flagship_cfg(tiny=False)
    model = build_detector_from_cfg(cfg.model)
    batch = _make_batch(cfg, batch_size=1, num_points=30000)
    init_fn = jax.jit(lambda r, b: model.init(r, b, mode='tensor'))
    variables = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    host_pts = np.asarray(batch['points'])
    host_img = np.asarray(batch['imgs'])

    m = cfg.model
    results = {}

    # ---- 1. voxelize ----
    vox_fn = jax.jit(lambda p, pm: batch_hard_voxelize(
        p, pm, voxel_size=tuple(m.voxel_size),
        pc_range=tuple(cfg.point_cloud_range),
        max_points=m.max_num_points,
        max_voxels_per_sample=m.max_voxels, reduce='mean'))

    def vox_args(i):
        return (jax.device_put(host_pts + np.float32(1e-3 * i)),
                batch['points_mask'])
    results['voxelize'] = timeit(vox_fn, vox_args, args.iters, 'voxelize')

    vox = vox_fn(batch['points'], batch['points_mask'])
    jax.block_until_ready(vox)
    cdt = jnp.dtype(m.compute_dtype if 'compute_dtype' in m else 'float32')

    # ---- 2. middle encoder (dense conv3d) ----
    mid_fn = jax.jit(lambda vf, co: model.apply(
        variables, vf.astype(cdt), co, 1, train=False,
        method=lambda mdl, vf, co, b, train: mdl._middle_encoder(
            vf, co, b, train=train)))

    def mid_args(i):
        return (vox['voxels'] + np.float32(1e-3 * i), vox['coords'])
    results['middle_conv3d'] = timeit(mid_fn, mid_args, args.iters,
                                      'middle encoder (conv3d)')

    # ---- 3. camera branch: backbone+neck ----
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
    results['img_backbone_neck'] = timeit(imgb_fn, imgb_args, args.iters,
                                          'img backbone+neck (swin)')

    f0 = imgb_fn(batch['imgs'])
    jax.block_until_ready(f0)

    # ---- 4. view transform ----
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
    results['view_transform'] = timeit(vt_fn, vt_args, args.iters,
                                       'view transform (LSS+pool)')

    bev_img = vt_fn(f0, batch)
    pts_bev = mid_fn(vox['voxels'], vox['coords'])
    jax.block_until_ready((bev_img, pts_bev))

    # ---- 5. fuser + BEV backbone + neck ----
    def fused(mdl, a, b_, train):
        x = mdl._fuser([a.astype(cdt), b_], train=train)
        x = mdl._backbone(x, train=train)
        return mdl._neck(x, train=train)
    fuse_fn = jax.jit(lambda a, b_: model.apply(variables, a, b_, False,
                                                method=fused))

    def fuse_args(i):
        return (bev_img + np.float32(1e-3 * i), pts_bev)
    results['fuser_backbone_neck'] = timeit(fuse_fn, fuse_args, args.iters,
                                            'fuser+SECOND+FPN')

    xfeat = fuse_fn(bev_img, pts_bev)
    jax.block_until_ready(xfeat)

    # ---- 6. head forward ----
    head_fn = jax.jit(lambda x: model.apply(
        variables, x.astype(jnp.float32), False,
        method=lambda mdl, x, train: mdl._bbox_head(x, train=train)))

    def head_args(i):
        return (xfeat + np.float32(1e-3 * i),)
    results['head_forward'] = timeit(head_fn, head_args, args.iters,
                                     'head forward (transfusion)')

    res0 = head_fn(xfeat)
    jax.block_until_ready(res0)

    # ---- 7. head predict (decode+nms) ----
    pred_fn = jax.jit(lambda r: model.apply(
        variables, r, method=lambda mdl, r: mdl._bbox_head.predict_by_feat(r)))

    def pred_args(i):
        r = dict(res0)
        k = next(iter(r))
        r = {kk: (vv + np.float32(1e-4 * i) if kk == k else vv)
             for kk, vv in r.items()}
        return (r,)
    results['head_predict'] = timeit(pred_fn, pred_args, args.iters,
                                     'head predict (decode)')

    # ---- full model for comparison ----
    full_fn = jax.jit(lambda v, b: model.apply(v, b, mode='predict',
                                               train=False))

    def full_args(i):
        b = dict(batch)
        b['points'] = jax.device_put(host_pts + np.float32(1e-3 * i))
        return (variables, b)
    results['full_predict'] = timeit(full_fn, full_args, args.iters,
                                     'FULL model predict')

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == '__main__':
    main()
