"""SemanticKITTI → info-pkl converter.

Ref: tools/dataset_converters/semantickitti_converter.py — walks the
sequence folders (velodyne/*.bin + labels/*.label), maps raw label ids to
the train id space, and emits the seg info pkl consumed by
SemanticKittiDataset.
"""
from __future__ import annotations

import argparse
import os
import pickle

TRAIN_SEQS = ['00', '01', '02', '03', '04', '05', '06', '07', '09', '10']
VAL_SEQS = ['08']
TEST_SEQS = [f'{i:02d}' for i in range(11, 22)]

# raw → train id (ref semantic-kitti.yaml learning_map, condensed)
LEARNING_MAP = {
    0: 255, 1: 255, 10: 0, 11: 1, 13: 4, 15: 2, 16: 4, 18: 3, 20: 4,
    30: 5, 31: 6, 32: 7, 40: 8, 44: 9, 48: 10, 49: 11, 50: 12, 51: 13,
    52: 255, 60: 8, 70: 14, 71: 15, 72: 16, 80: 17, 81: 18, 99: 255,
    252: 0, 253: 6, 254: 5, 255: 7, 256: 4, 257: 4, 258: 3, 259: 4}


def build_semantickitti_infos(root, split='train', out_file=None):
    seqs = {'train': TRAIN_SEQS, 'val': VAL_SEQS,
            'test': TEST_SEQS}[split]
    data_list = []
    for seq in seqs:
        vdir = os.path.join(root, 'sequences', seq, 'velodyne')
        if not os.path.isdir(vdir):
            continue
        for fn in sorted(os.listdir(vdir)):
            if not fn.endswith('.bin'):
                continue
            frame = os.path.splitext(fn)[0]
            info = dict(
                sample_idx=f'{seq}_{frame}',
                lidar_points=dict(
                    lidar_path=os.path.join('sequences', seq, 'velodyne',
                                            fn),
                    num_pts_feats=4))
            lbl = os.path.join('sequences', seq, 'labels',
                               frame + '.label')
            if os.path.exists(os.path.join(root, lbl)):
                info['pts_semantic_mask_path'] = lbl
            data_list.append(info)
    out = dict(metainfo=dict(dataset='semantickitti',
                             learning_map=LEARNING_MAP),
               data_list=data_list)
    out_file = out_file or os.path.join(
        root, f'semantickitti_infos_{split}.pkl')
    with open(out_file, 'wb') as f:
        pickle.dump(out, f)
    return data_list, out_file


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--split', default='train')
    ap.add_argument('--out', default=None)
    a = ap.parse_args()
    infos, out = build_semantickitti_infos(a.root, a.split, a.out)
    print(f'wrote {len(infos)} infos -> {out}')


if __name__ == '__main__':
    main()
