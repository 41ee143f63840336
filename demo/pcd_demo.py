#!/usr/bin/env python
"""Point-cloud detection demo (ref: demo/pcd_demo.py).

Usage: python demo/pcd_demo.py CLOUD.bin CONFIG [--checkpoint DIR]
       [--out-dir demo_out]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--show', action='store_true',
                   help='also open an interactive 3D window when a '
                        'display is available (ref demo --show)')
    args = p.parse_args()

    import numpy as np
    from tpu_bev3d.apis import inference_detector, init_model
    from tpu_bev3d.visualization import Det3DVisualizer

    model = init_model(args.config, args.checkpoint)
    res = inference_detector(model, args.pcd)[0]
    keep = res['scores'] > args.score_thr
    print(f'{keep.sum()} detections over {args.score_thr}:')
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
                       out_file=os.path.join(args.out_dir, 'bev.png'),
                       pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
    print(f'wrote {out}')
    out3d = vis.draw_points_3d(
        pts[:, :3], pred_bboxes=res['bboxes'][keep], show=args.show,
        out_file=os.path.join(args.out_dir, 'scene3d.png'))
    print(f'wrote {out3d}')


if __name__ == '__main__':
    main()
