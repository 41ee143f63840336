"""Base 3D detection dataset over info-pkl files.

TPU-native analogue of ref mmdet3d/datasets/det3d_dataset.py:18
(Det3DDataset(BaseDataset) with parse_ann_info:200 / parse_data_info:263 /
prepare_data:359). The host-side pipeline is pure numpy; the packed output
is a fixed-shape dict ready for device transfer.

Info pkl format matches the reference converters' output
(tools/create_data.py → {'metainfo': ..., 'data_list': [...]}), so pkls
produced by the reference tooling load directly.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from ..registry import DATASETS, TRANSFORMS


def compose(transforms_cfg: Sequence) -> Callable:
    """Build a transform pipeline from config dicts (ref mmengine Compose)."""
    tfs = []
    for t in transforms_cfg:
        tfs.append(TRANSFORMS.build(dict(t)) if isinstance(t, dict) else t)

    def run(results):
        for t in tfs:
            results = t(results)
            if results is None:
                return None
        return results

    return run


@DATASETS.register_module()
class Det3DDataset:
    """Args mirror the reference surface (det3d_dataset.py:18-100)."""

    METAINFO: Dict[str, Any] = {'classes': []}

    def __init__(self, data_root: str = '', ann_file: str = '',
                 pipeline: Sequence = (), metainfo: Optional[dict] = None,
                 modality: Optional[dict] = None,
                 data_prefix: Optional[dict] = None,
                 box_type_3d: str = 'LiDAR',
                 filter_empty_gt: bool = True, test_mode: bool = False,
                 load_interval: int = 1, **kwargs):
        self.data_root = data_root
        self.ann_file = ann_file
        self.metainfo = dict(self.METAINFO)
        if metainfo:
            self.metainfo.update(metainfo)
        self.classes = list(self.metainfo.get('classes', []))
        self.label_mapping = {name: i for i, name in enumerate(self.classes)}
        self.modality = modality or dict(use_lidar=True, use_camera=False)
        self.data_prefix = dict(pts='', img='', sweeps='')
        if data_prefix:
            self.data_prefix.update(data_prefix)
        self.filter_empty_gt = filter_empty_gt
        self.test_mode = test_mode
        self.pipeline = compose(pipeline)
        self.info_metainfo: Dict[str, Any] = {}
        self.data_list = self._load_data_list()[::load_interval]
        self.label_remap = self._build_label_remap()

    # ------------------------------------------------------------------ io

    def _load_data_list(self) -> List[dict]:
        path = self.ann_file
        if self.data_root and not os.path.isabs(path):
            path = os.path.join(self.data_root, path)
        with open(path, 'rb') as f:
            data = pickle.load(f)
        if isinstance(data, dict) and 'data_list' in data:
            self.info_metainfo = data.get('metainfo', {}) or {}
            return data['data_list']
        return data

    def _build_label_remap(self) -> Optional[dict]:
        """Map info-pkl label ids → dataset class indices.

        Ref BaseDataset/Det3DDataset build label_mapping from the pkl's
        own class table so a pkl whose class order differs from (or is a
        superset of) the training classes still yields correct labels —
        v2 infos carry ``categories`` (name→id, det3d_dataset.py:131-157),
        v1 infos a ``CLASSES`` tuple. Classes outside the training set
        map to -1 (DontCare semantics)."""
        cats = self.info_metainfo.get('categories')
        if isinstance(cats, dict) and cats:
            return {int(i): self.label_mapping.get(n, -1)
                    for n, i in cats.items()}
        seq = self.info_metainfo.get('CLASSES') \
            or self.info_metainfo.get('classes')
        if seq and list(seq) != self.classes:
            return {i: self.label_mapping.get(n, -1)
                    for i, n in enumerate(seq)}
        return None

    def __len__(self):
        return len(self.data_list)

    # ------------------------------------------------------------- parsing

    def parse_ann_info(self, info: dict) -> Optional[dict]:
        """instances → {'gt_bboxes_3d': [N,7+] f32, 'gt_labels_3d': [N]}.
        Ref det3d_dataset.py:200-262 (label remap via metainfo classes;
        -1 for classes outside the set)."""
        instances = info.get('instances', [])
        if not instances:
            return None
        boxes, labels = [], []
        for inst in instances:
            boxes.append(np.asarray(inst['bbox_3d'], np.float32))
            name = inst.get('bbox_label_3d', inst.get('bbox_label'))
            if isinstance(name, str):
                labels.append(self.label_mapping.get(name, -1))
            elif self.label_remap is not None:
                labels.append(self.label_remap.get(int(name), -1))
            else:
                labels.append(int(name))
        return dict(gt_bboxes_3d=np.stack(boxes).astype(np.float32),
                    gt_labels_3d=np.asarray(labels, np.int64))

    def parse_data_info(self, info: dict) -> dict:
        """Attach absolute paths + parsed annotations.
        Ref det3d_dataset.py:263-358."""
        out = dict(info)
        if 'lidar_points' in info:
            lp = dict(info['lidar_points'])
            p = lp.get('lidar_path', '')
            if p and not os.path.isabs(p):
                lp['lidar_path'] = os.path.join(
                    self.data_root, self.data_prefix.get('pts', ''), p)
            out['lidar_points'] = lp
            out['lidar_path'] = lp.get('lidar_path')
            # v2 sweeps store a path whose directory must be re-rooted
            # under data_prefix (ref det3d_dataset.py:285-295: basename +
            # pts-prefix if 'samples' in path else sweeps-prefix).
            if 'lidar_sweeps' in info and (self.data_prefix.get('sweeps')
                                           or self.data_prefix.get('pts')):
                sweeps = []
                for sw in info['lidar_sweeps']:
                    sw = dict(sw)
                    swlp = dict(sw.get('lidar_points', {}))
                    sp = swlp.get('lidar_path', '')
                    if sp and not os.path.isabs(sp):
                        pref = self.data_prefix['pts'] if 'samples' in sp \
                            else self.data_prefix.get('sweeps', '')
                        swlp['lidar_path'] = os.path.join(
                            self.data_root, pref, os.path.basename(sp))
                    sw['lidar_points'] = swlp
                    sweeps.append(sw)
                out['lidar_sweeps'] = sweeps
        if self.modality.get('use_camera') and 'images' in info:
            imgs = {}
            for cam_id, ci in info['images'].items():
                ci = dict(ci) if isinstance(ci, dict) else ci
                if isinstance(ci, dict) and ci.get('img_path') \
                        and not os.path.isabs(ci['img_path']):
                    pref = self.data_prefix.get(
                        cam_id, self.data_prefix.get('img', ''))
                    ci['img_path'] = os.path.join(
                        self.data_root, pref, ci['img_path'])
                imgs[cam_id] = ci
            out['images'] = imgs
        if not self.test_mode:
            out['ann_info'] = self.parse_ann_info(info)
        out['box_type_3d'] = 'LiDAR'
        out['metainfo'] = self.metainfo
        # mix-style transforms (PolarMix/LaserMix) draw a second sample
        # through this handle (ref Seg3DDataset passes `dataset` through)
        out['dataset'] = self
        return out

    # ------------------------------------------------------------ sampling

    def get_data_info(self, idx: int) -> dict:
        return self.parse_data_info(self.data_list[idx])

    def prepare_data(self, idx: int) -> Optional[dict]:
        """Run the pipeline; on empty-GT (train) retry another index
        (ref det3d_dataset.py:359-407)."""
        example = self.pipeline(self.get_data_info(idx))
        if (not self.test_mode and self.filter_empty_gt and example is not None
                and example.get('gt_labels_3d') is not None
                and len(example['gt_labels_3d']) == 0):
            return None
        return example

    def __getitem__(self, idx: int) -> dict:
        if self.test_mode:
            return self.prepare_data(idx)
        rng = np.random.default_rng(idx)
        for _ in range(20):
            out = self.prepare_data(idx)
            if out is not None:
                return out
            idx = int(rng.integers(0, len(self)))
        raise RuntimeError('cannot find a valid sample after 20 tries')

    def get_cat_ids(self, idx: int) -> List[int]:
        """Class ids present in sample idx (for CBGS resampling,
        ref det3d_dataset.py:408-423)."""
        ann = self.parse_ann_info(self.data_list[idx]) or {}
        labels = ann.get('gt_labels_3d', np.zeros((0,), np.int64))
        return sorted(set(int(l) for l in labels if l >= 0))
