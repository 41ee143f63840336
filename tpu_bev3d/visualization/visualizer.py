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
                                  out_file: str = 'proj.png',
                                  box_frame: str = 'lidar'):
        """Project 3D boxes onto an image (ref draw_proj_bboxes_3d:480).

        box_frame='camera': boxes are camera-frame 7-DoF (mono heads) and
        ``lidar2img`` is then just cam2img as a [3,4] (or [4,4]) matrix.
        """
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(np.clip(img, 0, 1) if img.dtype.kind == 'f' else img)
        H, W = img.shape[:2]
        cfun = B.corners_camera if box_frame == 'camera' else B.corners_lidar
        corners = cfun(np.asarray(bboxes, np.float32))         # [N,8,3]
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

    # ------------------------------------------------------- seg / 3D views

    def draw_seg_mask(self, points: np.ndarray, seg_labels: np.ndarray,
                      out_file: str = 'seg.png',
                      ignore_index: int = 255,
                      pc_range=(-54, -54, 54, 54)):
        """Per-point class-colored BEV render of a segmentation result
        (ref local_visualizer.py _draw_pts_sem_seg:740 — Open3D point
        coloring replaced with a headless scatter)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from matplotlib.colors import to_rgb

        pts = np.asarray(points)
        lab = np.asarray(seg_labels).astype(np.int64)
        keep = lab != ignore_index
        pts, lab = pts[keep], lab[keep]
        n_cls = int(lab.max()) + 1 if len(lab) else 1
        colors = np.asarray([to_rgb(self.palette[i % len(self.palette)])
                             for i in range(max(n_cls, 1))])
        fig, ax = plt.subplots(figsize=(10, 10))
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], s=0.3,
                       c=colors[np.clip(lab, 0, len(colors) - 1)])
        ax.set_xlim(pc_range[0], pc_range[2])
        ax.set_ylim(pc_range[1], pc_range[3])
        ax.set_aspect('equal')
        fig.savefig(out_file, dpi=120, bbox_inches='tight')
        plt.close(fig)
        return out_file

    def draw_points_3d(self, points: np.ndarray,
                       gt_bboxes: Optional[np.ndarray] = None,
                       pred_bboxes: Optional[np.ndarray] = None,
                       seg_labels: Optional[np.ndarray] = None,
                       out_file: str = 'scene3d.png', elev: float = 30,
                       azim: float = -60, max_points: int = 40000,
                       show: bool = False):
        """3D scene view (ref Det3DLocalVisualizer's Open3D window →
        matplotlib 3D axes): height- or class-colored points with
        wireframe boxes. ``show=True`` opens an interactive window
        (rotate/zoom via the matplotlib 3D toolbar — the Open3D-window
        analogue; Open3D itself is not in this image) when a display is
        available, and silently falls back to headless otherwise."""
        import os as _os

        import matplotlib
        show = bool(show and _os.environ.get('DISPLAY'))
        if not show:
            matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from matplotlib.colors import to_rgb

        pts = np.asarray(points)[:max_points]
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection='3d')
        if len(pts):
            if seg_labels is not None:
                lab = np.asarray(seg_labels)[:max_points].astype(np.int64)
                cols = np.asarray(
                    [to_rgb(self.palette[i % len(self.palette)])
                     for i in range(max(int(lab.max()) + 1, 1))])
                c = cols[np.clip(lab, 0, len(cols) - 1)]
            else:
                c = pts[:, 2]
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.2, c=c)
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]

        def boxes3d(bb, color):
            if bb is None or not len(bb):
                return
            corners = B.corners_lidar(np.asarray(bb, np.float32))
            for cs in corners:
                for a, b2 in edges:
                    ax.plot([cs[a, 0], cs[b2, 0]], [cs[a, 1], cs[b2, 1]],
                            [cs[a, 2], cs[b2, 2]], c=color, lw=0.8)

        boxes3d(gt_bboxes, 'g')
        boxes3d(pred_bboxes, 'r')
        ax.view_init(elev=elev, azim=azim)
        if show:
            plt.show()  # blocking interactive window
        fig.savefig(out_file, dpi=110, bbox_inches='tight')
        plt.close(fig)
        return out_file

    # -------------------------------------------------- everything entry

    def add_datasample(self, name: str, data_input: dict,
                       pred: Optional[dict] = None,
                       gt: Optional[dict] = None,
                       out_dir: str = '.', vis_task: str = 'lidar_det',
                       score_thr: float = 0.3):
        """Draw-everything entry (ref local_visualizer.py
        add_datasample:930): renders whatever the inputs carry —
        BEV + 3D views of points with GT/pred boxes, seg-mask coloring,
        and image projections — into ``out_dir/<name>_*.png``.

        data_input: 'points' [P,C]; optional 'img' HWC + 'lidar2img'.
        pred: 'bboxes'/'scores'/'labels' (+'mask') or
        'pts_semantic_mask'. gt: 'gt_bboxes_3d' (+'gt_labels_3d') or
        'pts_semantic_mask'. Returns the list of written files.
        """
        import os
        os.makedirs(out_dir, exist_ok=True)
        written = []
        points = data_input.get('points')
        pb = pl = None
        if pred is not None and 'bboxes' in pred:
            pb = np.asarray(pred['bboxes']).reshape(
                -1, np.shape(pred['bboxes'])[-1])
            sc = np.asarray(pred.get('scores',
                                     np.ones(len(pb)))).ravel()
            keep = sc > score_thr
            if 'mask' in pred:
                keep &= np.asarray(pred['mask']).ravel()
            pb = pb[keep]
            if 'labels' in pred:
                pl = np.asarray(pred['labels']).ravel()[keep]
        gb = None
        if gt is not None and gt.get('gt_bboxes_3d') is not None:
            gb = np.asarray(gt['gt_bboxes_3d'])
            gb = gb.reshape(-1, gb.shape[-1])
            if gt.get('gt_mask') is not None:
                gb = gb[np.asarray(gt['gt_mask']).ravel()]
        if points is not None and vis_task in ('lidar_det', 'multi-modality_det'):
            written.append(self.draw_bev(
                points=points, gt_bboxes=gb, pred_bboxes=pb,
                pred_labels=pl,
                out_file=os.path.join(out_dir, f'{name}_bev.png')))
            written.append(self.draw_points_3d(
                points, gt_bboxes=gb, pred_bboxes=pb,
                out_file=os.path.join(out_dir, f'{name}_3d.png')))
        if points is not None and vis_task == 'lidar_seg':
            seg = (pred or {}).get('pts_semantic_mask',
                                   (gt or {}).get('pts_semantic_mask'))
            if seg is not None:
                written.append(self.draw_seg_mask(
                    points, np.asarray(seg).ravel()[:len(points)],
                    out_file=os.path.join(out_dir, f'{name}_seg.png')))
                written.append(self.draw_points_3d(
                    points, seg_labels=np.asarray(seg).ravel()[:len(points)],
                    out_file=os.path.join(out_dir, f'{name}_seg3d.png')))
        img = data_input.get('img')
        if img is not None and pb is not None \
                and data_input.get('lidar2img') is not None:
            written.append(self.draw_proj_bboxes_on_image(
                np.asarray(img), pb,
                np.asarray(data_input['lidar2img']).reshape(4, 4),
                out_file=os.path.join(out_dir, f'{name}_proj.png')))
        return written
