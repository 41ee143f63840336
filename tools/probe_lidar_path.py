#!/usr/bin/env python
"""Per-block timing probe for the FLAGSHIP LIDAR path (the round-4
attribution showed the L+C flagship is lidar-bound: lidar-only 31.8 ms
~= full L+C 31-33 ms).

Protocol: REPS executions inside one jitted lax.scan with a perturbed
carry, one readback — the only trustworthy per-op instrument on this
tunnel (same as tools/probe_tile_bevfusion.py). Subtract the ~23 ms
host<->device RTT from the single timed call, divide by REPS.

Blocks timed at flagship-fast scale (config bevfusion_lidar_cam_tpu_
fast_nus.py: 30k pts, max_voxels=68000, pack_xy=4, bf16 trunk):
  voxelize      batch_hard_voxelize(mean)            [1,30000,5]
  pts_feat      extract_pts_feat (voxelize+encoder)  -> [1,180,180,256]
  stem_scatter  fused_stem_scatter op                V=68000 -> 360^2x128
  trunk         BEVColumnEncoder conv stages (bf16)  360^2 -> 180^2x256
  backbone_neck SECOND + SECONDFPN conv chain (bf16) 180^2x256 -> 180^2x512
  head          BEVFusionHead forward (fp32 island)  180^2x512 -> preds

Feeds the REAL nuScenes demo cloud (surface-clustered occupancy).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=16)
    ap.add_argument('--blocks', default='')
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
    from tpu_bev3d.config import Config
    from tpu_bev3d.ops.voxelize import batch_hard_voxelize
    from tpu_bev3d.models.middle_encoders.bev_column_encoder import (
        fused_stem_scatter)
    from tpu_bev3d.testing import build_detector_from_cfg

    cfg = Config.fromfile(os.path.join(
        root, 'configs/bevfusion/bevfusion_lidar_cam_tpu_fast_nus.py'))
    model = build_detector_from_cfg(cfg.model)

    # real cloud -> padded [1, 30000, 5]
    binf = os.path.join(root, 'tests', 'data', 'demo', 'nuscenes',
                        'n015-2018-07-24-11-22-45+0800__LIDAR_TOP__'
                        '1532402927647951.pcd.bin')
    pts = np.fromfile(binf, np.float32).reshape(-1, 5)
    lo, hi = np.array([-54, -54, -5.]), np.array([54, 54, 3.])
    keep = ((pts[:, :3] >= lo) & (pts[:, :3] < hi)).all(1)
    pts = pts[keep][:30000]
    P = 30000
    buf = np.zeros((1, P, 5), np.float32)
    buf[0, :len(pts)] = pts
    msk = np.zeros((1, P), bool)
    msk[0, :len(pts)] = True
    points = jnp.asarray(buf)
    points_mask = jnp.asarray(msk)

    mv = int(cfg.model['max_voxels'])
    vs, rng_ = tuple(cfg.model['voxel_size']), \
        tuple(cfg.model['point_cloud_range'])
    vox = jax.jit(lambda p, m: batch_hard_voxelize(
        p, m, voxel_size=vs, pc_range=rng_, max_points=10,
        max_voxels_per_sample=mv, reduce='mean'))(points, points_mask)
    coords = vox['coords']
    nreal = int((np.asarray(coords[:, 0]) >= 0).sum())
    print(f'# real cloud: {len(pts)} pts -> {nreal} voxels '
          f'(cap {mv})', flush=True)

    rng = np.random.default_rng(0)
    CDT = jnp.bfloat16

    def timed(name, fn, x0):
        """fn: x -> y with tree_struct(y) == tree_struct(x) not required;
        carries a scalar that perturbs the input each rep."""
        def run(x0):
            def body(c, _):
                x, s = c
                xp = jax.tree_util.tree_map(
                    lambda a: a + s.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, x)
                y = fn(xp)
                acc = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-20
                          for l in jax.tree_util.tree_leaves(y)
                          if jnp.issubdtype(l.dtype, jnp.floating))
                return (x, s + 1e-6 + acc), 0
            (_, s), _ = jax.lax.scan(body, (x0, jnp.float32(0)), None,
                                     length=REPS)
            return s
        jf = jax.jit(run)
        jax.block_until_ready(jf(x0))                    # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(x0))
            best = min(best, (time.perf_counter() - t0) * 1000)
        print(f'{name:16s} {(best - 23) / REPS:8.2f} ms/op   '
              f'(total {best:.0f} ms, {REPS} reps)', flush=True)

    want = set(args.blocks.split(',')) if args.blocks else None

    def on(b):
        return want is None or b in want

    # ---- init once (jitted); full real batch so the camera branch is
    # initialized too (img_feat / full blocks need it)
    sys.path.insert(0, root)
    from __graft_entry__ import _make_real_batch
    batch0 = _make_real_batch(cfg, num_points=P)
    if batch0 is None:
        batch0 = dict(points=points, points_mask=points_mask)
    else:
        batch0['points'] = points
        batch0['points_mask'] = points_mask
    init_fn = jax.jit(lambda r: model.init(
        r, batch0, mode='tensor'))
    variables = init_fn(jax.random.PRNGKey(0))

    if on('voxelize'):
        timed('voxelize', lambda p: batch_hard_voxelize(
            p, points_mask, voxel_size=vs, pc_range=rng_, max_points=10,
            max_voxels_per_sample=mv, reduce='mean'), points)

    if on('pts_feat'):
        timed('pts_feat', lambda p: model.apply(
            variables, p, points_mask, train=False,
            method=type(model).extract_pts_feat), points)

    if on('stem_scatter'):
        me = cfg.model['middle_encoder']
        nz, ny, nx = me['sparse_shape']
        p_ = me['pack_xy']
        ch0 = me['stem_channels']
        w = jnp.asarray(rng.standard_normal(
            (nz * p_ * p_, 5, ch0)).astype(np.float32) * 0.05, CDT)
        vf = vox['voxels'].astype(CDT)
        timed('stem_scatter', lambda f: fused_stem_scatter(
            f, coords, w, batch_size=1, nz=nz, ny=ny, nx=nx,
            pack_xy=p_), vf)

    def conv_chain(specs):
        """specs: list of (cin, cout, stride). NHWC bf16 conv+relu chain."""
        ws = [jnp.asarray(rng.standard_normal((3, 3, ci, co))
                          .astype(np.float32) * 0.02, CDT)
              for ci, co, _ in specs]

        def f(x):
            for (ci, co, st), w_ in zip(specs, ws):
                x = jax.lax.conv_general_dilated(
                    x, w_, (st, st), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                x = jax.nn.relu(x)
            return x
        return f

    if on('trunk'):
        x0 = jnp.asarray(rng.standard_normal((1, 360, 360, 128))
                         .astype(np.float32), CDT)
        timed('trunk', conv_chain([(128, 128, 1), (128, 256, 2),
                                   (256, 256, 1)]), x0)

    if on('backbone_neck'):
        x0 = jnp.asarray(rng.standard_normal((1, 180, 180, 256))
                         .astype(np.float32), CDT)
        b1 = [(256, 128, 1)] + [(128, 128, 1)] * 5
        b2 = [(128, 256, 2)] + [(256, 256, 1)] * 5
        f1, f2 = conv_chain(b1), conv_chain(b2)
        # neck: 1x1-ish lateral + upsample approximated by convs at the
        # right scales (SECONDFPN deconv 256->256 x2 from 90^2)
        wup = jnp.asarray(rng.standard_normal((3, 3, 256, 256))
                          .astype(np.float32) * 0.02, CDT)

        def f(x):
            y1 = f1(x)
            y2 = f2(y1)
            up = jax.lax.conv_transpose(
                y2, wup, (2, 2), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            lat = jax.lax.conv_general_dilated(
                y1, jnp.asarray(rng.standard_normal((3, 3, 128, 256))
                                .astype(np.float32) * 0.02, CDT),
                (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return jnp.concatenate([lat, up], -1)
        timed('backbone_neck', f, x0)

    x0 = jnp.asarray(rng.standard_normal((1, 180, 180, 512))
                     .astype(np.float32))
    if on('head'):
        # bind the real head through the detector
        timed('head', lambda x: model.apply(
            variables, x.astype(jnp.dtype(model.head_dtype)), train=False,
            method=lambda m, xx, train: m._bbox_head(xx, train=train)),
            x0)

    if on('predict_delta'):
        timed('head_predict', lambda x: model.apply(
            variables, x.astype(jnp.dtype(model.head_dtype)), train=False,
            method=lambda m, xx, train: m._bbox_head.predict_by_feat(
                m._bbox_head(xx, train=train))), x0)

    if on('img_feat') and 'imgs' in batch0:
        timed('img_feat', lambda im: model.apply(
            variables, dict(batch0, imgs=im), train=False,
            method=lambda m, b, train: m.extract_img_feat(b, train)[0]),
            batch0['imgs'])

    if on('swin_neck') and 'imgs' in batch0:
        def _sn(m, im, train):
            B, N, H, W, C3 = im.shape
            x = im.reshape(B * N, H, W, C3).astype(
                jnp.dtype(m.compute_dtype))
            return m._img_neck(m._img_backbone(x, train=train),
                               train=train)[0]
        timed('swin_neck', lambda im: model.apply(
            variables, im, train=False, method=_sn), batch0['imgs'])

    if on('view_transform') and 'imgs' in batch0:
        def _feat(m, im, train):
            B, N, H, W, C3 = im.shape
            x = im.reshape(B * N, H, W, C3).astype(
                jnp.dtype(m.compute_dtype))
            f = m._img_neck(m._img_backbone(x, train=train),
                            train=train)[0]
            fh, fw, fc = f.shape[1:]
            return f.reshape(B, N, fh, fw, fc)
        feat0 = jax.jit(lambda im: model.apply(
            variables, im, train=False, method=_feat))(batch0['imgs'])
        cam_params = {k: batch0[k] for k in
                      ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                       'lidar2img', 'lidar_aug') if k in batch0}

        def _vt(m, f, train):
            return m._view_transform(
                f, cam_params, points=batch0['points'],
                points_mask=batch0['points_mask'], train=train)[0]
        timed('view_transform', lambda f: model.apply(
            variables, f, train=False, method=_vt), feat0)

    if (on('vt_geom') or on('vt_depthmap') or on('vt_pool')) \
            and 'imgs' in batch0:
        cam_params = {k: batch0[k] for k in
                      ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                       'lidar2img', 'lidar_aug') if k in batch0}
        if on('vt_geom'):
            timed('vt_geom', lambda c2l: model.apply(
                variables, train=False,
                method=lambda m, train: m._view_transform.get_geometry(
                    c2l, cam_params['intrins'], cam_params['post_rots'],
                    cam_params['post_trans'],
                    cam_params.get('lidar_aug'))), batch0['cam2lidar'])
        if on('vt_depthmap'):
            from tpu_bev3d.models.view_transforms.depth_lss import (
                project_points_to_depth)
            timed('vt_depthmap', lambda p: project_points_to_depth(
                p, points_mask, cam_params['lidar2img'], (256, 704),
                cam_params.get('lidar_aug')), points)
        if on('vt_pool'):
            vt = cfg.model['view_transform']
            D = int(round((vt['dbound'][1] - vt['dbound'][0])
                          / vt['dbound'][2]))
            dl0 = jnp.asarray(rng.standard_normal(
                (1, 6, 32, 88, D)).astype(np.float32))
            f0 = jnp.asarray(rng.standard_normal(
                (1, 6, 32, 88, vt['out_channels'])).astype(np.float32),
                CDT)
            geom0 = jax.jit(lambda c2l: model.apply(
                variables, train=False,
                method=lambda m, train: m._view_transform.get_geometry(
                    c2l, cam_params['intrins'], cam_params['post_rots'],
                    cam_params['post_trans'],
                    cam_params.get('lidar_aug'))))(batch0['cam2lidar'])
            timed('vt_pool', lambda dl: model.apply(
                variables, train=False,
                method=lambda m, train: m._view_transform.lift_and_pool(
                    dl, f0, geom0)), dl0)

    if on('full') and 'imgs' in batch0:
        timed('full_predict', lambda im: model.apply(
            variables, dict(batch0, imgs=im), mode='predict',
            train=False), batch0['imgs'])


if __name__ == '__main__':
    main()
