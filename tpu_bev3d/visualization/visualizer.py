"""Lightweight 3D detection visualizer (matplotlib; no GUI deps).

Ref: mmdet3d/visualization/local_visualizer.py:42 Det3DLocalVisualizer —
the Open3D interactive window is replaced by headless renders: BEV scatter
+ rotated-box drawing (draw_bev_bboxes:378) and 3D-box projection onto
images (draw_proj_bboxes_3d:480).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..structures import boxes3d as B


class Det3DVisualizer:
    def __init__(self, classes: Sequence[str] = (),
                 palette: Optional[Sequence] = None):
        self.classes = list(classes)
        self.palette = palette or [
            'tab:blue', 'tab:orange', 'tab:green', 'tab:red', 'tab:purple',
            'tab:brown', 'tab:pink', 'tab:gray', 'tab:olive', 'tab:cyan']

    def draw_bev(self, points: Optional[np.ndarray] = None,
                 gt_bboxes: Optional[np.ndarray] = None,
                 pred_bboxes: Optional[np.ndarray] = None,
                 pred_labels: Optional[np.ndarray] = None,
                 out_file: str = 'bev.png', pc_range=(-54, -54, 54, 54)):
        """Render BEV: grey points, green GT, per-class colored preds."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10))
        if points is not None and len(points):
            ax.scatter(points[:, 0], points[:, 1], s=0.1, c='0.6')

        def draw_boxes(boxes, color=None, labels=None):
            if boxes is None or not len(boxes):
                return
            corners = B.corners_bev(np.asarray(boxes, np.float32))
            for i, c in enumerate(corners):
                if color is not None:
                    col = color
                elif labels is not None:
                    col = self.palette[int(labels[i]) % len(self.palette)]
                else:
                    col = 'r'
                poly = np.concatenate([c, c[:1]], 0)
                ax.plot(poly[:, 0], poly[:, 1], c=col, lw=1.0)
                # heading tick from center to front-edge midpoint
                ctr = c.mean(0)
                front = (c[0] + c[1]) / 2
                ax.plot([ctr[0], front[0]], [ctr[1], front[1]], c=col,
                        lw=0.8)

        draw_boxes(gt_bboxes, color='g')
        draw_boxes(pred_bboxes, labels=pred_labels)
        ax.set_xlim(pc_range[0], pc_range[2])
        ax.set_ylim(pc_range[1], pc_range[3])
        ax.set_aspect('equal')
        fig.savefig(out_file, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return out_file

    def draw_proj_bboxes_on_image(self, img: np.ndarray, bboxes: np.ndarray,
                                  lidar2img: np.ndarray,
                                  out_file: str = 'proj.png'):
        """Project 3D boxes onto an image (ref draw_proj_bboxes_3d:480)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(np.clip(img, 0, 1) if img.dtype.kind == 'f' else img)
        H, W = img.shape[:2]
        corners = B.corners_lidar(np.asarray(bboxes, np.float32))  # [N,8,3]
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for c in corners:
            hom = np.concatenate([c, np.ones((8, 1))], -1) @ lidar2img.T
            z = hom[:, 2]
            if (z <= 0.1).all():
                continue
            uv = hom[:, :2] / np.maximum(z[:, None], 0.1)
            for a, b in edges:
                if z[a] > 0.1 and z[b] > 0.1:
                    ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]],
                            c='lime', lw=0.8)
        ax.set_xlim(0, W)
        ax.set_ylim(H, 0)
        fig.savefig(out_file, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return out_file
