#!/usr/bin/env python
"""Monocular 3D detection demo (ref: demo/mono_det_demo.py — image + an
infos file carrying cam2img → camera-frame boxes projected onto the image).

Usage: python demo/mono_det_demo.py IMG INFOS CONFIG [--checkpoint DIR]
       [--cam-type CAM_FRONT] [--out-dir demo_out] [--score-thr 0.3]

INFOS: a v2-schema infos pkl (or .json with a plain 'cam2img' entry); the
cam2img for the chosen camera is pulled from its first sample.
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def _load_cam2img(path, cam_type):
    if path.endswith('.json'):
        with open(path) as f:
            d = json.load(f)
        return d['cam2img'] if 'cam2img' in d \
            else d['images'][cam_type]['cam2img']
    with open(path, 'rb') as f:
        infos = pickle.load(f)
    sample = infos['data_list'][0]
    images = sample['images']
    cam = images.get(cam_type) or next(iter(images.values()))
    return cam['cam2img']


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('infos')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--cam-type', default='CAM_FRONT',
                   help='CAM_FRONT (nuScenes) / CAM2 (KITTI)')
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np
    from tpu_bev3d.apis import inference_mono_3d_detector, init_model
    from tpu_bev3d.visualization import Det3DVisualizer

    model = init_model(args.config, args.checkpoint)
    img = np.asarray(plt.imread(args.img))
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img[..., :3]
    K = np.asarray(_load_cam2img(args.infos, args.cam_type),
                   np.float32)[:3, :3]
    res = inference_mono_3d_detector(model, img, K)[0]
    keep = res['scores'] > args.score_thr
    print(f'{int(keep.sum())} detections over {args.score_thr}:')
    for b, s, l in zip(res['bboxes'][keep], res['scores'][keep],
                       res['labels'][keep]):
        print(f'  cls={int(l)} score={s:.3f} box={np.round(b, 2)}')

    os.makedirs(args.out_dir, exist_ok=True)
    vis = Det3DVisualizer()
    out = vis.draw_proj_bboxes_on_image(
        img, res['bboxes'][keep], np.concatenate(
            [K, np.zeros((3, 1), np.float32)], -1),
        box_frame='camera',
        out_file=os.path.join(args.out_dir, 'mono_det.png'))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
