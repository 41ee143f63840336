#!/usr/bin/env python
"""Point-cloud semantic segmentation demo (ref: demo/pcd_seg_demo.py).

Usage: python demo/pcd_seg_demo.py CLOUD.bin CONFIG [--checkpoint DIR]
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
    args = p.parse_args()

    import numpy as np
    from tpu_bev3d.apis import inference_segmentor, init_model
    from tpu_bev3d.visualization import Det3DVisualizer

    model = init_model(args.config, args.checkpoint)
    res = inference_segmentor(model, args.pcd)[0]
    labels = res['pts_semantic_mask']
    uniq, counts = np.unique(labels, return_counts=True)
    print('per-class point counts:')
    classes = model.cfg.get('class_names', [])
    for u, c in zip(uniq, counts):
        name = classes[int(u)] if int(u) < len(classes) else str(int(u))
        print(f'  {name}: {c}')

    os.makedirs(args.out_dir, exist_ok=True)
    from tpu_bev3d.apis.inference import _point_dim
    dim = _point_dim(model.cfg)
    pts = np.fromfile(args.pcd, np.float32).reshape(-1, dim)[:len(labels)]
    vis = Det3DVisualizer(classes=classes)
    pcr = model.cfg.model.get('point_cloud_range',
                              (-50, -50, -4, 50, 50, 2))
    out = vis.draw_seg_mask(
        pts[:, :3], labels,
        out_file=os.path.join(args.out_dir, 'seg.png'),
        pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
