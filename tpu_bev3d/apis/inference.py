"""Python inference API.

Ref: mmdet3d/apis/inference.py — init_model:38 (config+ckpt → model with
cfg attached), inference_detector:121-187 (build test pipeline, swap the
first stage to LoadPointsFromDict for ndarray input, run model.test_step).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..config import Config


def _point_dim(cfg) -> int:
    """Raw point feature count from the model config: the voxel encoder's
    in_channels, else the middle encoder's (models like the flagship
    BEVColumnEncoder consume raw points directly), else cfg.point_dim."""
    m = cfg.model
    ve = m.get('voxel_encoder', {}) or {}
    if 'in_channels' in ve or 'num_features' in ve:
        return int(ve.get('in_channels', ve.get('num_features')))
    me = m.get('middle_encoder', {}) or {}
    if 'in_channels' in me:
        return int(me['in_channels'])
    return int(cfg.get('point_dim', 4))


class InferenceModel:
    """A built detector + its variables + a jitted predict fn."""

    def __init__(self, cfg: Config, model, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        import jax
        self._predict = jax.jit(
            lambda v, b: model.apply(v, b, mode='predict', train=False))

    def predict(self, batch):
        return self._predict(self.variables, batch)


_MONO_TYPES = ('SMOKEMono3D', 'FCOSMono3D', 'MonoFlex')


def _mono_image_hw(cfg) -> tuple:
    """Init image size for mono models: the test pipeline's AffineResize
    img_scale (W, H) when present, else a KITTI-shaped default."""
    try:
        pipe = cfg.test_dataloader['dataset']['pipeline']
    except Exception:
        pipe = []
    for t in pipe:
        if 'img_scale' in t:
            w, h = t['img_scale']
            return int(h), int(w)
    return 384, 1280


def _make_init_batch(cfg):
    """Modality-appropriate synthetic init batch (the init params tree
    must contain every branch the inference batch will exercise — a
    lidar-only init would silently skip the camera branch of fusion
    models and fail at predict time)."""
    import numpy as np
    from ..testing import create_detector_inputs, create_multimodal_inputs

    m = cfg.model
    t = m.get('type', '')
    pcr = tuple(m.get('point_cloud_range', (-54, -54, -5, 54, 54, 3)))
    if 'img_backbone' not in m:
        return create_detector_inputs(
            batch_size=1, num_points=1024, point_dim=_point_dim(cfg),
            pc_range=pcr)
    K = np.array([[320., 0., 160.], [0., 320., 96.], [0., 0., 1.]],
                 np.float32)
    if t in _MONO_TYPES:
        h, w = _mono_image_hw(cfg)
        rng = np.random.default_rng(0)
        return dict(imgs=rng.normal(size=(1, h, w, 3)).astype(np.float32),
                    cam2img=K[None])
    if t == 'DfM':
        rng = np.random.default_rng(0)
        return dict(imgs=rng.normal(size=(1, 2, 192, 320, 3)
                                    ).astype(np.float32),
                    cam2img=K[None])
    if t == 'YOLOX2D':
        rng = np.random.default_rng(0)
        return dict(imgs=rng.normal(size=(1, 256, 448, 3)
                                    ).astype(np.float32))
    # multi-camera (PETR/StreamPETR/ImVoxelNet) and LiDAR+camera fusion
    # (BEVFusion/MVXNet): full calibration stacks
    vt = m.get('view_transform', {}) or {}
    image_size = tuple(vt.get('image_size',
                              m.get('image_size', (256, 704))))
    batch = create_multimodal_inputs(
        batch_size=1, num_points=1024, point_dim=_point_dim(cfg),
        image_size=image_size, pc_range=pcr)
    if t == 'StreamPETR':
        batch['ego_motion'] = np.eye(4, dtype=np.float32)[None]
    return batch


def init_model(config: Union[str, Config],
               checkpoint: Optional[str] = None,
               rng_seed: int = 0) -> InferenceModel:
    """Build a detector from config (+ optional orbax checkpoint dir)."""
    import jax
    import jax.numpy as jnp
    import tpu_bev3d.models  # noqa: F401
    from ..registry import MODELS

    cfg = Config.fromfile(config) if isinstance(config, str) else config
    model = MODELS.build(dict(cfg.model))
    init_batch = _make_init_batch(cfg)
    init_batch = {k: jnp.asarray(v) for k, v in init_batch.items()}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mode='tensor'))(
            jax.random.PRNGKey(rng_seed), init_batch)
    if checkpoint and str(checkpoint).endswith(('.pth', '.pt')):
        # reference-zoo torch checkpoint: convert through the model
        # family's mapping table (utils/mappings.py)
        from ..utils.mappings import mapping_for_model
        from ..utils.torch_convert import (convert_torch_checkpoint,
                                           load_torch_state_dict)
        sd = load_torch_state_dict(checkpoint)
        out = convert_torch_checkpoint(
            sd, variables, mapping_for_model(dict(cfg.model)))
        variables = {'params': out['params'],
                     'batch_stats': out.get('batch_stats', {})}
        return InferenceModel(cfg, model, variables)
    if checkpoint:
        from ..engine.checkpoint import restore_checkpoint
        from ..engine.optim import build_optimizer
        from ..engine.train_state import TrainState
        import jax
        tx, _ = build_optimizer({'type': 'adamw'}, 1)
        params = variables['params']
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=variables.get('batch_stats', {}),
                           opt_state=tx.init(params))
        state = restore_checkpoint(checkpoint, jax.device_get(state))
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
    return InferenceModel(cfg, model, variables)


def camera_param_stack(sample: dict, cams: Optional[Sequence[str]] = None,
                       image_hw=None) -> dict:
    """Assemble the model's camera-batch calibration dict from one
    v2-schema infos sample (``sample['images'][CAM]`` blocks with
    cam2img/lidar2cam, ref loading.py:14 BEVLoadMultiViewImageFromFiles).

    Returns cam2lidar/intrins/post_rots/post_trans/lidar2img stacks
    (identity post transforms — callers that resize images should fold
    their own aug matrix in).
    """
    images = sample['images']
    cams = list(cams or images.keys())
    c2i, l2c = [], []
    for cam in cams:
        ci = images[cam]
        k = np.eye(4, dtype=np.float32)
        cam2img = np.asarray(ci.get('cam2img', np.eye(3)), np.float32)
        k[:cam2img.shape[0], :cam2img.shape[1]] = cam2img
        c2i.append(k[:3, :3])
        l2c.append(np.asarray(ci.get('lidar2cam', np.eye(4)), np.float32))
    c2i = np.stack(c2i)
    l2c = np.stack(l2c)
    k4 = np.tile(np.eye(4, dtype=np.float32), (len(cams), 1, 1))
    k4[:, :3, :3] = c2i
    n = len(cams)
    return dict(
        cam2lidar=np.linalg.inv(l2c).astype(np.float32),
        intrins=c2i,
        post_rots=np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
        post_trans=np.zeros((n, 3), np.float32),
        lidar2img=(k4 @ l2c).astype(np.float32))


def inference_detector(model: InferenceModel,
                       pcds: Union[str, np.ndarray, Sequence]) -> list:
    """Run 3D detection on point cloud(s) — path(s) to .bin or ndarray(s).

    Returns a list of dicts with numpy 'bboxes'/'scores'/'labels' per cloud
    (fixed-shape with validity already applied).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(pcds, (str, np.ndarray)):
        pcds = [pcds]
    num_feats = _point_dim(model.cfg)
    # fixed point capacity from the model's voxel budget
    cap = int(model.cfg.get('inference_num_points', 120000))
    results = []
    for pcd in pcds:
        if isinstance(pcd, str):
            pts = np.fromfile(pcd, np.float32).reshape(-1, num_feats) \
                if not pcd.endswith('.npy') else np.load(pcd)
        else:
            pts = np.asarray(pcd, np.float32)
        if pts.shape[1] < num_feats:
            pts = np.concatenate(
                [pts, np.zeros((len(pts), num_feats - pts.shape[1]),
                               np.float32)], -1)
        pts = pts[:, :num_feats]
        n = min(len(pts), cap)
        buf = np.zeros((cap, num_feats), np.float32)
        buf[:n] = pts[:n]
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        batch = dict(points=jnp.asarray(buf)[None],
                     points_mask=jnp.asarray(mask)[None])
        out = jax.device_get(model.predict(batch))
        keep = out['mask'][0]
        results.append(dict(bboxes=out['bboxes'][0][keep],
                            scores=out['scores'][0][keep],
                            labels=out['labels'][0][keep]))
    return results


def inference_mono_3d_detector(model: InferenceModel, imgs, cam2img):
    """Monocular 3D detection (ref apis/inference.py
    inference_mono_3d_detector): image(s) + per-image 3×3 intrinsics →
    camera-frame boxes."""
    import jax
    import jax.numpy as jnp

    single = isinstance(imgs, np.ndarray) and imgs.ndim == 3
    if single:
        imgs = [imgs]
        cam2img = [cam2img]
    results = []
    for im, K in zip(imgs, cam2img):
        batch = dict(imgs=jnp.asarray(im, jnp.float32)[None],
                     cam2img=jnp.asarray(K, jnp.float32)[None])
        out = jax.device_get(model.predict(batch))
        keep = out['mask'][0]
        results.append(dict(bboxes=out['bboxes'][0][keep],
                            scores=out['scores'][0][keep],
                            labels=out['labels'][0][keep]))
    return results


def inference_multi_modality_detector(model: InferenceModel, pcds, imgs,
                                      cam_params):
    """LiDAR + camera detection (ref apis/inference.py
    inference_multi_modality_detector): points + multi-view images +
    calibration dict (cam2lidar/intrins/post_rots/post_trans/lidar2img
    arrays, [N,…] per sample)."""
    import jax
    import jax.numpy as jnp

    if isinstance(pcds, (str, np.ndarray)):
        pcds = [pcds]
        imgs = [imgs]
        cam_params = [cam_params]
    num_feats = _point_dim(model.cfg)
    cap = int(model.cfg.get('inference_num_points', 120000))
    vt = model.cfg.model.get('view_transform', {}) or {}
    if vt.get('static_pool') and cam_params:
        # serving setup: register the rig's static-pool gather plan from
        # the first sample's calibration (no-op if already registered)
        from ..models.view_transforms.depth_lss import ensure_pool_plan
        import jax.numpy as _jnp
        cp0 = cam_params[0] if isinstance(cam_params, (list, tuple)) \
            else cam_params
        ensure_pool_plan(vt, {
            k: _jnp.asarray(np.asarray(v, np.float32))[None]
            for k, v in cp0.items()
            if k in ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                     'lidar_aug')})
    results = []
    for pcd, im, cp in zip(pcds, imgs, cam_params):
        pts = np.fromfile(pcd, np.float32).reshape(-1, num_feats) \
            if isinstance(pcd, str) else np.asarray(pcd, np.float32)
        n = min(len(pts), cap)
        buf = np.zeros((cap, num_feats), np.float32)
        buf[:n] = pts[:n, :num_feats]
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        batch = dict(points=jnp.asarray(buf)[None],
                     points_mask=jnp.asarray(mask)[None],
                     imgs=jnp.asarray(im, jnp.float32)[None])
        for k, v in cp.items():
            batch[k] = jnp.asarray(v, jnp.float32)[None]
        out = jax.device_get(model.predict(batch))
        keep = out['mask'][0]
        results.append(dict(bboxes=out['bboxes'][0][keep],
                            scores=out['scores'][0][keep],
                            labels=out['labels'][0][keep]))
    return results


def inference_segmentor(model: InferenceModel, pcds):
    """Point-cloud semantic segmentation (ref apis/inference.py
    inference_segmentor)."""
    import jax
    import jax.numpy as jnp

    if isinstance(pcds, (str, np.ndarray)):
        pcds = [pcds]
    num_feats = _point_dim(model.cfg)
    cap = int(model.cfg.get('inference_num_points', 120000))
    results = []
    for pcd in pcds:
        pts = np.fromfile(pcd, np.float32).reshape(-1, num_feats) \
            if isinstance(pcd, str) else np.asarray(pcd, np.float32)
        n = min(len(pts), cap)
        buf = np.zeros((cap, num_feats), np.float32)
        buf[:n] = pts[:n, :num_feats]
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        batch = dict(points=jnp.asarray(buf)[None],
                     points_mask=jnp.asarray(mask)[None])
        out = jax.device_get(model.predict(batch))
        results.append(dict(
            pts_semantic_mask=out['pts_semantic_mask'][0][:n],
            logits=out['logits'][0][:n]))
    return results
