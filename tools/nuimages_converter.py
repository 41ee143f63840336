"""nuImages → COCO-format converter (devkit-free).

Ref: tools/dataset_converters/nuimage_converter.py — converts nuImages
2D annotations to COCO json for the auxiliary 2D heads. nuImages ships
JSON tables (sample_data, object_ann, category, attribute); this walks
them directly like the nuScenes converter.

Usage: python tools/nuimages_converter.py --root data/nuimages
       --version v1.0-mini --out data/nuimages/annotations.json
"""
from __future__ import annotations

import argparse
import json
import os

NAME_MAP = {
    'vehicle.car': 'car', 'vehicle.truck': 'truck',
    'vehicle.bus.bendy': 'bus', 'vehicle.bus.rigid': 'bus',
    'vehicle.trailer': 'trailer', 'vehicle.construction':
    'construction_vehicle', 'vehicle.motorcycle': 'motorcycle',
    'vehicle.bicycle': 'bicycle',
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'human.pedestrian.police_officer': 'pedestrian',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.barrier': 'barrier',
}
CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
           'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
           'barrier')


def create_nuimages_coco(root, version='v1.0-mini', out_file=None):
    tdir = os.path.join(root, version)

    def load(name):
        with open(os.path.join(tdir, name + '.json')) as f:
            return json.load(f)

    sample_data = load('sample_data')
    object_ann = load('object_ann')
    category = {c['token']: c['name'] for c in load('category')}

    images, annotations = [], []
    img_id = {}
    for sd in sample_data:
        if not sd.get('is_key_frame'):
            continue
        if not sd['filename'].endswith(('.jpg', '.png')):
            continue
        iid = len(images)
        img_id[sd['token']] = iid
        images.append(dict(id=iid, file_name=sd['filename'],
                           width=sd.get('width', 1600),
                           height=sd.get('height', 900)))
    for ann in object_ann:
        sd_tok = ann['sample_data_token']
        if sd_tok not in img_id:
            continue
        name = NAME_MAP.get(category.get(ann['category_token'], ''))
        if name is None:
            continue
        x1, y1, x2, y2 = ann['bbox']
        annotations.append(dict(
            id=len(annotations), image_id=img_id[sd_tok],
            category_id=CLASSES.index(name),
            bbox=[x1, y1, x2 - x1, y2 - y1],
            area=(x2 - x1) * (y2 - y1), iscrowd=0))
    coco = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i, name=c) for i, c in enumerate(CLASSES)])
    out_file = out_file or os.path.join(root,
                                        f'nuimages_{version}_coco.json')
    with open(out_file, 'w') as f:
        json.dump(coco, f)
    return coco, out_file


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--version', default='v1.0-mini')
    ap.add_argument('--out', default=None)
    a = ap.parse_args()
    coco, out = create_nuimages_coco(a.root, a.version, a.out)
    print(f"wrote {len(coco['images'])} images / "
          f"{len(coco['annotations'])} anns -> {out}")


if __name__ == '__main__':
    main()
