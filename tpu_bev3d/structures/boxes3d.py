"""3D box structures and functional box math.

TPU-native replacement for the reference's box structures
(ref: mmdet3d/structures/bbox_3d/base_box3d.py:15, lidar_box3d.py:13,
box_3d_mode.py). Design differences from the reference:

- The data-pipeline / eval side uses a thin numpy-backed ``Boxes3D`` class
  (this file). The model side never sees the class — inside jit everything is
  raw ``[N, 7+]`` arrays manipulated by the functional ops below, which work
  on both numpy and jax.numpy arrays.
- Box encoding matches the reference exactly for parity:
  ``(x, y, z, dx, dy, dz, yaw[, vx, vy])`` with gravity/bottom-center origin
  ``(0.5, 0.5, 0)`` for LiDAR boxes (ref: lidar_box3d.py:13-40); yaw is
  rotation around the up-axis, counter-clockwise in LiDAR mode.
"""
from __future__ import annotations

import numpy as np

# Coordinate modes (ref: mmdet3d/structures/bbox_3d/box_3d_mode.py)
LIDAR = 'lidar'    # x forward, y left, z up; yaw around z
CAM = 'camera'     # x right, y down, z forward; yaw around y
DEPTH = 'depth'    # x right, y forward, z up; yaw around z


# ---------------------------------------------------------------------------
# Functional ops — work on numpy or jnp arrays (module chosen from the input).
# ---------------------------------------------------------------------------

def _xp(a):
    return np if isinstance(a, np.ndarray) else __import__('jax.numpy', fromlist=['jnp'])


def rot_mat_z(yaw, xp=np):
    """[...,3,3] rotation around +z by yaw (counter-clockwise)."""
    c, s = xp.cos(yaw), xp.sin(yaw)
    o, z = xp.ones_like(c), xp.zeros_like(c)
    return xp.stack([
        xp.stack([c, -s, z], -1),
        xp.stack([s, c, z], -1),
        xp.stack([z, z, o], -1),
    ], -2)


def corners_lidar(boxes, xp=np, origin=(0.5, 0.5, 0.0)):
    """[N,7]->[N,8,3] corners of LiDAR boxes (bottom-center origin).

    Corner order matches ref lidar_box3d.py:41-88 docstring:
    below-forward-left first face then up face (x0y0z0, x0y0z1, x0y1z1, ...).
    """
    dims = boxes[..., 3:6]
    # unit corners in {0,1}^3, ref base_box3d corners template
    unit = xp.asarray([
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ], dtype=boxes.dtype) - xp.asarray(origin, dtype=boxes.dtype)
    corners = unit[None] * dims[..., None, :]  # [N,8,3]
    rot = rot_mat_z(boxes[..., 6], xp)  # [N,3,3]
    corners = xp.einsum('nij,nkj->nki', rot, corners)
    return corners + boxes[..., None, :3]


def corners_camera(boxes, xp=np, origin=(0.5, 1.0, 0.5)):
    """[N,7]->[N,8,3] corners of CAMERA-frame boxes (x right, y down,
    z forward; yaw around -y; origin = bottom center, the mmdet3d
    CameraInstance3DBoxes convention, ref cam_box3d.py:95-141)."""
    dims = boxes[..., 3:6]
    unit = xp.asarray([
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ], dtype=boxes.dtype) - xp.asarray(origin, dtype=boxes.dtype)
    corners = unit[None] * dims[..., None, :]                # [N,8,3]
    yaw = boxes[..., 6]
    c, s = xp.cos(yaw), xp.sin(yaw)
    z = xp.zeros_like(c)
    o = xp.ones_like(c)
    # rotation about the (downward) y axis: ref rotation_3d_in_axis axis=1
    rot = xp.stack([
        xp.stack([c, z, s], -1),
        xp.stack([z, o, z], -1),
        xp.stack([-s, z, c], -1),
    ], -2)
    corners = xp.einsum('nij,nkj->nki', rot, corners)
    return corners + boxes[..., None, :3]


def corners_bev(boxes, xp=np):
    """[N,7+]->[N,4,2] BEV (x,y) corners of rotated boxes."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6]
    c, s = xp.cos(yaw), xp.sin(yaw)
    # local corners (+-dx/2, +-dy/2)
    lx = xp.stack([dx, dx, -dx, -dx], -1) * 0.5
    ly = xp.stack([-dy, dy, dy, -dy], -1) * 0.5
    gx = lx * c[..., None] - ly * s[..., None] + x[..., None]
    gy = lx * s[..., None] + ly * c[..., None] + y[..., None]
    return xp.stack([gx, gy], -1)


def bev(boxes):
    """[N,7+]->[N,5] (x, y, dx, dy, yaw). ref base_box3d.py bev property."""
    return boxes[..., [0, 1, 3, 4, 6]]


def rotate(boxes, angle, points=None, xp=np):
    """Rotate boxes (and optionally points) around z by ``angle`` (scalar).

    Returns rotated boxes [N,7+] (velocities in dims 7:9 rotated too) and
    points if given. ref: lidar_box3d.py:106-151.
    """
    rot = rot_mat_z(xp.asarray(angle, dtype=boxes.dtype), xp)
    ctr = boxes[..., :3] @ rot.T
    new = xp.concatenate([
        ctr,
        boxes[..., 3:6],
        (boxes[..., 6:7] + angle),
    ], -1)
    if boxes.shape[-1] > 7:
        vel = boxes[..., 7:9] @ rot[:2, :2].T
        new = xp.concatenate([new, vel, boxes[..., 9:]], -1)
    if points is not None:
        pts = xp.concatenate([points[..., :3] @ rot.T, points[..., 3:]], -1)
        return new, pts
    return new


def flip(boxes, direction='horizontal', xp=np):
    """BEV flip. LiDAR mode: horizontal = flip y, vertical = flip x.
    ref: lidar_box3d.py:153-180."""
    b = xp.array(boxes, copy=True) if xp is np else boxes
    if direction == 'horizontal':
        y = -boxes[..., 1:2]
        yaw = -boxes[..., 6:7]
        parts = [boxes[..., 0:1], y, boxes[..., 2:6], yaw]
        if boxes.shape[-1] > 7:
            parts += [boxes[..., 7:8], -boxes[..., 8:9], boxes[..., 9:]]
    else:
        x = -boxes[..., 0:1]
        yaw = -(boxes[..., 6:7] + np.pi)
        parts = [x, boxes[..., 1:6], yaw]
        if boxes.shape[-1] > 7:
            parts += [-boxes[..., 7:8], boxes[..., 8:9], boxes[..., 9:]]
    return xp.concatenate(parts, -1)


def translate(boxes, trans, xp=np):
    return xp.concatenate([boxes[..., :3] + xp.asarray(trans, dtype=boxes.dtype),
                           boxes[..., 3:]], -1)


def scale(boxes, factor, xp=np):
    parts = [boxes[..., :6] * factor, boxes[..., 6:7]]
    if boxes.shape[-1] > 7:
        parts += [boxes[..., 7:9] * factor, boxes[..., 9:]]
    return xp.concatenate(parts, -1)


def in_range_bev(boxes, box_range, xp=np):
    """[N] bool: box center within [x0, y0, x1, y1].
    ref: base_box3d.py:in_range_bev uses center."""
    x, y = boxes[..., 0], boxes[..., 1]
    return ((x > box_range[0]) & (y > box_range[1])
            & (x < box_range[2]) & (y < box_range[3]))


def in_range_3d(boxes, box_range, xp=np):
    x, y, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    return ((x > box_range[0]) & (y > box_range[1]) & (z > box_range[2])
            & (x < box_range[3]) & (y < box_range[4]) & (z < box_range[5]))


def limit_yaw(yaw, offset=0.5, period=np.pi * 2, xp=np):
    """Limit yaw to [-offset*period, (1-offset)*period).
    ref: mmdet3d/structures/bbox_3d/utils.py limit_period."""
    return yaw - xp.floor(yaw / period + offset) * period


def points_in_rbbox(points, boxes, origin=(0.5, 0.5, 0.0)):
    """[P,3+],[N,7] -> [P,N] bool mask, numpy. Point-in-rotated-box via
    inverse transform to the box frame (replaces mmcv points_in_boxes /
    ref box_np_ops.points_in_rbbox)."""
    xp = np if isinstance(points, np.ndarray) else _jnp()
    pts = points[..., :3]
    ctr = boxes[:, :3]
    dims = boxes[:, 3:6]
    yaw = boxes[:, 6]
    # shift origin: boxes store bottom-center, test against true center
    offs = (xp.asarray(origin) - 0.5) * dims  # local offset of stored origin
    local = pts[:, None, :] - ctr[None, :, :]
    c, s = xp.cos(-yaw), xp.sin(-yaw)
    lx = local[..., 0] * c[None] - local[..., 1] * s[None]
    ly = local[..., 0] * s[None] + local[..., 1] * c[None]
    lz = local[..., 2]
    lx = lx + offs[None, :, 0]
    ly = ly + offs[None, :, 1]
    lz = lz + offs[None, :, 2]
    return ((xp.abs(lx) < dims[None, :, 0] / 2)
            & (xp.abs(ly) < dims[None, :, 1] / 2)
            & (xp.abs(lz) < dims[None, :, 2] / 2))


def _jnp():
    import jax.numpy as jnp
    return jnp


def cam_to_lidar(boxes, cam2lidar, xp=np):
    """Camera-frame boxes [N,7] (x right, y down, z fwd; y = bottom) →
    LiDAR-frame [N,7]. Ref: Box3DMode.convert (box_3d_mode.py) with an
    explicit rt_mat. dims (l, h, w) reorder to (dx=l, dy=w, dz=h); yaw
    converts as lidar_yaw = -cam_yaw - π/2."""
    ctr = xp.concatenate([boxes[:, :3], xp.ones_like(boxes[:, :1])], -1)
    ctr = ctr @ xp.asarray(cam2lidar, dtype=boxes.dtype).T
    l, h, w = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    yaw = -boxes[:, 6:7] - np.pi / 2
    return xp.concatenate([ctr[:, :3], l, w, h, yaw], -1)


def lidar_to_cam(boxes, lidar2cam, xp=np):
    """Inverse of cam_to_lidar."""
    ctr = xp.concatenate([boxes[:, :3], xp.ones_like(boxes[:, :1])], -1)
    ctr = ctr @ xp.asarray(lidar2cam, dtype=boxes.dtype).T
    dx, dy, dz = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    yaw = -(boxes[:, 6:7] + np.pi / 2)
    return xp.concatenate([ctr[:, :3], dx, dz, dy, yaw], -1)


# ---------------------------------------------------------------------------
# Class wrapper for the host-side pipeline
# ---------------------------------------------------------------------------

class Boxes3D:
    """numpy-backed 3D boxes, analogue of ref BaseInstance3DBoxes
    (base_box3d.py:15). ``tensor`` is [N, box_dim] float32."""

    def __init__(self, tensor, box_dim=7, mode=LIDAR, origin=(0.5, 0.5, 0.0)):
        t = np.asarray(tensor, dtype=np.float32).reshape(-1, box_dim) \
            if np.size(tensor) else np.zeros((0, box_dim), np.float32)
        self.tensor = t
        self.box_dim = box_dim
        self.mode = mode
        self.origin = origin

    # -- basic container protocol --
    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, idx):
        t = self.tensor[idx]
        if t.ndim == 1:
            t = t[None]
        return Boxes3D(t, self.box_dim, self.mode, self.origin)

    @classmethod
    def cat(cls, boxes_list):
        if not boxes_list:
            return cls(np.zeros((0, 7), np.float32))
        b0 = boxes_list[0]
        return cls(np.concatenate([b.tensor for b in boxes_list], 0),
                   b0.box_dim, b0.mode, b0.origin)

    # -- geometry properties (ref base_box3d.py:83-270) --
    @property
    def gravity_center(self):
        c = self.tensor[:, :3].copy()
        c[:, 2] += self.tensor[:, 5] * 0.5
        return c

    @property
    def center(self):
        return self.tensor[:, :3]

    @property
    def dims(self):
        return self.tensor[:, 3:6]

    @property
    def yaw(self):
        return self.tensor[:, 6]

    @property
    def height(self):
        return self.tensor[:, 5]

    @property
    def volume(self):
        return np.prod(self.tensor[:, 3:6], axis=1)

    @property
    def corners(self):
        return corners_lidar(self.tensor, np, self.origin)

    @property
    def bev(self):
        return bev(self.tensor)

    @property
    def corners_bev(self):
        return corners_bev(self.tensor)

    # -- transforms (mutating, like the reference) --
    def rotate(self, angle, points=None):
        if points is not None:
            self.tensor, pts = rotate(self.tensor, angle, points, np)
            return pts
        self.tensor = rotate(self.tensor, angle, None, np)

    def flip(self, direction='horizontal', points=None):
        self.tensor = flip(self.tensor, direction, np)
        if points is not None:
            pts = points.copy()
            if direction == 'horizontal':
                pts[:, 1] = -pts[:, 1]
            else:
                pts[:, 0] = -pts[:, 0]
            return pts

    def translate(self, trans):
        self.tensor = translate(self.tensor, trans, np)

    def scale(self, factor):
        self.tensor = scale(self.tensor, factor, np)

    def limit_yaw(self, offset=0.5, period=np.pi * 2):
        self.tensor[:, 6] = limit_yaw(self.tensor[:, 6], offset, period, np)

    def in_range_bev(self, box_range):
        return in_range_bev(self.tensor, box_range, np)

    def in_range_3d(self, box_range):
        return in_range_3d(self.tensor, box_range, np)

    def points_in_boxes(self, points):
        return points_in_rbbox(points, self.tensor, self.origin)

    def copy(self):
        return Boxes3D(self.tensor.copy(), self.box_dim, self.mode, self.origin)

    def __repr__(self):
        return f'Boxes3D({self.mode}, n={len(self)}, dim={self.box_dim})'


# Aliases matching reference naming for config parity
LiDARBoxes3D = Boxes3D
