"""nuImages → COCO-format converter (devkit-free), with instance masks.

Ref: tools/dataset_converters/nuimage_converter.py — converts nuImages
2D annotations to COCO json for the auxiliary 2D heads; decodes each
object_ann['mask'] (base64 compressed RLE, :131) into the COCO
``segmentation`` field and composites semantic-seg maps (surface_ann
underneath, object_ann on top, :84-122). nuImages ships JSON tables
(sample_data, object_ann, surface_ann, category, attribute); this walks
them directly like the nuScenes converter and uses the pure-numpy RLE
codec in tpu_bev3d/utils/rle.py instead of the nuimages devkit.

Usage: python tools/nuimages_converter.py --root data/nuimages
       --version v1.0-mini --out data/nuimages/annotations.json
       [--semseg-dir data/nuimages/semseg]
"""
from __future__ import annotations

import argparse
import base64
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

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


def _name_to_index(categories):
    """Semantic-seg index map: background=0; all classes in table order
    except ego/driveable, which take the two highest indices (mirrors
    the devkit's name_to_index_mapping used by the reference converter).
    """
    special = ('flat.driveable_surface', 'vehicle.ego')
    names = [c['name'] for c in categories if c['name'] not in special]
    mapping = {n: i for i, n in enumerate(names, start=1)}
    nxt = len(names) + 1
    for s in special:
        if any(c['name'] == s for c in categories):
            mapping[s] = nxt
            nxt += 1
    return mapping


def _decode(ann_mask):
    from tpu_bev3d.utils.rle import mask_decode
    return mask_decode(ann_mask)


def _plain_counts(ann_mask):
    """nuImages base64 counts → plain COCO compressed-RLE counts string
    (ref nuimage_converter.py:131-133)."""
    c = ann_mask['counts']
    if isinstance(c, str):
        try:
            return base64.b64decode(c).decode()
        except Exception:
            return c
    return c.decode()


def create_nuimages_coco(root, version='v1.0-mini', out_file=None,
                         semseg_dir=None):
    tdir = os.path.join(root, version)

    def load(name):
        path = os.path.join(tdir, name + '.json')
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    sample_data = load('sample_data')
    object_ann = load('object_ann')
    surface_ann = load('surface_ann')
    categories = load('category')
    category = {c['token']: c['name'] for c in categories}
    sem_index = _name_to_index(categories)

    images, annotations = [], []
    img_id, img_meta = {}, {}
    for sd in sample_data:
        if not sd.get('is_key_frame'):
            continue
        if not sd['filename'].endswith(('.jpg', '.png')):
            continue
        iid = len(images)
        img_id[sd['token']] = iid
        rec = dict(id=iid, file_name=sd['filename'],
                   width=sd.get('width', 1600),
                   height=sd.get('height', 900))
        images.append(rec)
        img_meta[sd['token']] = rec

    # semantic-seg base layer: stuff/surface regions (ref :84-97)
    semseg = {}
    if semseg_dir is not None:
        for ann in surface_ann:
            tok = ann['sample_data_token']
            if tok not in img_id or ann.get('mask') is None:
                continue
            rec = img_meta[tok]
            seg = semseg.setdefault(
                tok, np.zeros((rec['height'], rec['width']), np.uint8))
            m = _decode(ann['mask'])
            seg[m == 1] = sem_index.get(category[ann['category_token']], 0)

    # object instances, sorted by token for a stable instance order
    # (ref :105-107)
    for ann in sorted(object_ann, key=lambda k: k.get('token', '')):
        sd_tok = ann['sample_data_token']
        if sd_tok not in img_id:
            continue
        raw_name = category.get(ann['category_token'], '')
        has_mask = ann.get('mask') is not None
        if semseg_dir is not None and has_mask:
            rec = img_meta[sd_tok]
            seg = semseg.setdefault(
                sd_tok, np.zeros((rec['height'], rec['width']), np.uint8))
            m = _decode(ann['mask'])
            seg[m == 1] = sem_index.get(raw_name, 0)
        name = NAME_MAP.get(raw_name)
        if name is None:
            continue
        x1, y1, x2, y2 = ann['bbox']
        rec = dict(
            id=len(annotations), image_id=img_id[sd_tok],
            category_id=CLASSES.index(name),
            bbox=[x1, y1, x2 - x1, y2 - y1],
            area=(x2 - x1) * (y2 - y1), iscrowd=0)
        if has_mask:
            # standard COCO compressed RLE (plain counts str, ref :129-133)
            rec['segmentation'] = dict(size=ann['mask']['size'],
                                       counts=_plain_counts(ann['mask']))
        annotations.append(rec)

    if semseg_dir is not None:
        from PIL import Image
        for tok, seg in semseg.items():
            fn = os.path.splitext(os.path.basename(
                img_meta[tok]['file_name']))[0] + '.png'
            os.makedirs(semseg_dir, exist_ok=True)
            Image.fromarray(seg).save(os.path.join(semseg_dir, fn))

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
    ap.add_argument('--semseg-dir', default=None,
                    help='also write semantic-seg index PNGs here')
    a = ap.parse_args()
    coco, out = create_nuimages_coco(a.root, a.version, a.out,
                                     semseg_dir=a.semseg_dir)
    print(f"wrote {len(coco['images'])} images / "
          f"{len(coco['annotations'])} anns -> {out}")


if __name__ == '__main__':
    main()
