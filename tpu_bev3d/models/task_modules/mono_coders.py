"""Monocular bbox coders as standalone registered task modules.

The reference ships SMOKE/MonoFlex/FCOS3D-PGD decode logic as separate
coder classes (ref mmdet3d/models/task_modules/coders/smoke_bbox_coder.py,
monoflex_bbox_coder.py, fcos3d_bbox_coder.py, pgd_bbox_coder.py) that
heads build via cfg. Here the decode math lives on the heads (one jitted
graph per head); these coders expose the SAME implementations behind the
reference's task-module API by duck-typing the head's unbound decode
methods — one source of truth, no drift.
"""
from __future__ import annotations

from typing import Any, Sequence

from ...registry import TASK_UTILS


@TASK_UTILS.register_module()
class SMOKECoder:
    """decode(out, cam2img) -> (boxes [B,M,7] cam-frame, scores, labels).
    Same math as SMOKEMono3DHead._decode_common."""

    def __init__(self, stride: int = 4,
                 depth_ref: Sequence[float] = (28.01, 16.32),
                 dim_ref: Any = ((3.88, 1.63, 1.53), (0.84, 1.76, 0.66),
                                 (1.78, 1.70, 0.58)),
                 max_num: int = 64):
        self.stride = stride
        self.depth_ref = tuple(depth_ref)
        self.dim_ref = tuple(tuple(d) for d in dim_ref)
        self.max_num = max_num

    def decode(self, out, cam2img):
        from ..dense_heads.smoke_head import SMOKEMono3DHead
        return SMOKEMono3DHead._decode_common(self, out, cam2img)


@TASK_UTILS.register_module()
class MonoFlexCoder:
    """decode(out, cam2img) — multibin orientation + uncertainty-weighted
    depth ensemble, same math as MonoFlexHead._decode_common."""

    def __init__(self, stride: int = 4, max_num: int = 64,
                 uncertainty_range: Sequence[float] = (-10.0, 10.0)):
        self.stride = stride
        self.max_num = max_num
        self.uncertainty_range = tuple(uncertainty_range)

    def decode(self, out, cam2img):
        from ..dense_heads.monoflex_head import MonoFlexHead
        return MonoFlexHead._decode_common(self, out, cam2img)

    def _ensemble_depth(self, r, fy):
        from ..dense_heads.monoflex_head import MonoFlexHead
        return MonoFlexHead._ensemble_depth(self, r, fy)


@TASK_UTILS.register_module()
class FCOS3DBBoxCoder:
    """decode_level(out, stride, cam2img) -> (boxes [B,HW,7], scores) —
    same math as FCOSMono3DHead._decode_level (PGD shares it)."""

    def __init__(self, depth_log: bool = True):
        self.depth_log = depth_log

    def decode_level(self, out, stride, cam2img):
        from ..dense_heads.fcos_mono3d_head import FCOSMono3DHead
        return FCOSMono3DHead._decode_level(self, out, stride, cam2img)
