"""Inferencer classes: preprocess → forward → visualize → postprocess.

Ref: mmdet3d/apis/inferencers/base_3d_inferencer.py:30 +
lidar_det3d_inferencer.py — callable objects wrapping the model with
visualization and dict-formatted outputs.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Union

import numpy as np

from .inference import InferenceModel, inference_detector, init_model


class Base3DInferencer:
    def __init__(self, model: Union[str, InferenceModel],
                 checkpoint: Optional[str] = None):
        self.model = model if isinstance(model, InferenceModel) \
            else init_model(model, checkpoint)

    def __call__(self, inputs, return_vis: bool = False,
                 out_dir: Optional[str] = None, score_thr: float = 0.3):
        results = self.forward(inputs)
        preds = [self.pred2dict(r, score_thr) for r in results]
        vis = []
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            vis = self.visualize(inputs, results, out_dir, score_thr)
        out = dict(predictions=preds)
        if return_vis:
            out['visualization'] = vis
        return out

    def forward(self, inputs):
        raise NotImplementedError

    def pred2dict(self, res, score_thr):
        keep = res['scores'] > score_thr
        return dict(
            bboxes_3d=res['bboxes'][keep].tolist(),
            scores_3d=res['scores'][keep].tolist(),
            labels_3d=res['labels'][keep].tolist())

    def visualize(self, inputs, results, out_dir, score_thr):
        return []


class LidarDet3DInferencer(Base3DInferencer):
    """Point-cloud detection inferencer (ref lidar_det3d_inferencer.py)."""

    def forward(self, inputs):
        return inference_detector(self.model, inputs)

    def visualize(self, inputs, results, out_dir, score_thr):
        from ..visualization import Det3DVisualizer
        vis = Det3DVisualizer()
        paths = []
        items = inputs if isinstance(inputs, (list, tuple)) else [inputs]
        pcr = self.model.cfg.model.point_cloud_range
        for i, (inp, res) in enumerate(zip(items, results)):
            pts = None
            if isinstance(inp, str):
                from .inference import _point_dim
                pts = np.fromfile(inp, np.float32).reshape(
                    -1, _point_dim(self.model.cfg))
            elif isinstance(inp, np.ndarray):
                pts = inp
            keep = res['scores'] > score_thr
            p = os.path.join(out_dir, f'vis_{i}.png')
            vis.draw_bev(points=pts, pred_bboxes=res['bboxes'][keep],
                         pred_labels=res['labels'][keep], out_file=p,
                         pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
            paths.append(p)
        return paths


class MonoDet3DInferencer(Base3DInferencer):
    """Monocular detection inferencer (ref mono_det3d_inferencer.py).
    inputs: list of dicts {img: ndarray HWC, cam2img: [3,3]}."""

    def forward(self, inputs):
        from .inference import inference_mono_3d_detector
        items = inputs if isinstance(inputs, (list, tuple)) else [inputs]
        return inference_mono_3d_detector(
            self.model, [i['img'] for i in items],
            [i['cam2img'] for i in items])


class MultiModalityDet3DInferencer(Base3DInferencer):
    """LiDAR+camera inferencer (ref multi_modality_det3d_inferencer.py).
    inputs: list of dicts {points, imgs, cam_params}."""

    def forward(self, inputs):
        from .inference import inference_multi_modality_detector
        items = inputs if isinstance(inputs, (list, tuple)) else [inputs]
        return inference_multi_modality_detector(
            self.model, [i['points'] for i in items],
            [i['imgs'] for i in items],
            [i['cam_params'] for i in items])


class LidarSeg3DInferencer(Base3DInferencer):
    """Segmentation inferencer (ref lidar_seg3d_inferencer.py)."""

    def forward(self, inputs):
        from .inference import inference_segmentor
        return inference_segmentor(self.model, inputs)
