#!/usr/bin/env python
"""LiDAR + multi-camera 3D detection demo (ref: demo/multi_modality_demo.py
— point cloud + images + infos calibration → fused detection, rendered as
BEV and image projections).

Usage: python demo/multi_modality_demo.py PCD IMG_DIR INFOS CONFIG
       [--checkpoint DIR] [--out-dir demo_out] [--score-thr 0.3]

IMG_DIR holds one image per camera named <CAM>.{png,jpg} (or a single
image file for one-camera models). INFOS: v2-schema infos pkl whose first
sample provides per-camera cam2img/lidar2cam (and sensor2lidar) blocks.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd')
    p.add_argument('img')
    p.add_argument('infos')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np
    from tpu_bev3d.apis import (camera_param_stack,
                                inference_multi_modality_detector,
                                init_model)
    from tpu_bev3d.visualization import Det3DVisualizer

    model = init_model(args.config, args.checkpoint)
    with open(args.infos, 'rb') as f:
        sample = pickle.load(f)['data_list'][0]

    cams = list(sample['images'].keys())
    imgs, use_cams = [], []
    for cam in cams:
        if os.path.isdir(args.img):
            cand = [os.path.join(args.img, cam + ext)
                    for ext in ('.png', '.jpg', '.jpeg')]
            path = next((c for c in cand if os.path.exists(c)), None)
            if path is None:
                continue
        else:
            path = args.img
        im = np.asarray(plt.imread(path), np.float32)
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        imgs.append(im[..., :3])
        use_cams.append(cam)
        if not os.path.isdir(args.img):
            break
    assert imgs, f'no camera images found under {args.img}'
    imgs_arr = np.stack(imgs)                         # [N, H, W, 3]
    cam_params = camera_param_stack(sample, use_cams)

    res = inference_multi_modality_detector(
        model, args.pcd, imgs_arr, cam_params)[0]
    keep = res['scores'] > args.score_thr
    print(f'{int(keep.sum())} detections over {args.score_thr}:')
    for b, s, l in zip(res['bboxes'][keep], res['scores'][keep],
                       res['labels'][keep]):
        print(f'  cls={int(l)} score={s:.3f} box={np.round(b, 2)}')

    os.makedirs(args.out_dir, exist_ok=True)
    from tpu_bev3d.apis.inference import _point_dim
    dim = _point_dim(model.cfg)
    pts = np.fromfile(args.pcd, np.float32).reshape(-1, dim)
    vis = Det3DVisualizer()
    pcr = model.cfg.model.point_cloud_range
    out = vis.draw_bev(points=pts, pred_bboxes=res['bboxes'][keep],
                       pred_labels=res['labels'][keep],
                       out_file=os.path.join(args.out_dir, 'fused_bev.png'),
                       pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
    print(f'wrote {out}')
    l2i = np.asarray(cam_params['lidar2img'], np.float32)
    for i, cam in enumerate(use_cams):
        out = vis.draw_proj_bboxes_on_image(
            imgs[i], res['bboxes'][keep][:, :7], l2i[i],
            out_file=os.path.join(args.out_dir, f'proj_{cam}.png'))
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
