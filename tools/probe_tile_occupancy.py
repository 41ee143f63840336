#!/usr/bin/env python
"""Per-stage ACTIVE-TILE occupancy of the faithful tile-sparse encoder on
the real nuScenes demo frame — sizes the serving config's tile capacities
(the tile backend is row-count-bound at ~16 ns/row, so capacity margin is
a first-class serving-latency lever; VERDICT r3 item 3).

Run (CPU fine — occupancy is content math, not a timing probe):
    TPU_BEV3D_PLATFORM=cpu python tools/probe_tile_occupancy.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    if os.environ.get('TPU_BEV3D_PLATFORM') == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _make_real_batch
    from tpu_bev3d.config import Config
    from tpu_bev3d.ops import tile_sparse as ts
    from tpu_bev3d.ops.voxelize import batch_hard_voxelize

    cfg_path = (sys.argv[1] if len(sys.argv) > 1 else
                'configs/bevfusion/bevfusion_lidar_cam_voxel0075_second_'
                'secfpn_staticpool_nus.py')
    cfg = Config.fromfile(cfg_path)
    m = cfg.model
    batch = _make_real_batch(cfg, num_points=36000)
    if batch is None:
        print('real fixture unavailable')
        return
    me = m.middle_encoder
    tile_shape = tuple(me.get('tile_shape', (2, 4, 4)))
    caps_cfg = me.get('tile_capacities')
    if caps_cfg:
        sched = [int(c) for c in caps_cfg]
    else:
        cap0 = int(me.tile_capacity)
        factor = float(me.get('tile_stage_factor', 0.5))
        sched, c = [cap0], cap0
        for _ in range(3):
            c = max(-(-int(c * factor) // 8) * 8, 8)
            sched.append(c)

    vox = batch_hard_voxelize(
        batch['points'], batch['points_mask'],
        voxel_size=tuple(m.voxel_size), pc_range=tuple(m.point_cloud_range),
        max_points=int(m.get('max_num_points', 10)),
        max_voxels_per_sample=int(m.max_voxels), reduce='mean')
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    sparse_shape = tuple(me.sparse_shape)
    st = SparseTensor(vox['voxels'], vox['coords'], sparse_shape, 1)
    n_vox = int(np.sum(np.asarray(vox['coords'])[:, 0] >= 0))
    print(f'real frame: {n_vox} voxels, sparse_shape {sparse_shape}, '
          f'tile {tile_shape}')

    # two passes under the EXACT spconv rule, mirroring SparseEncoder's
    # schedule (downsample after stages 0-2): unconstrained DEMAND, then
    # the config's capacity schedule with drop accounting
    pads = list(me.get('encoder_paddings',
                       ((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))))
    down_pads = [pads[i][-1] for i in range(3)]

    def march(caps):
        tt = ts.tiles_from_sparse(st, tile_shape, caps[0])
        counts = [int(np.sum(np.asarray(tt.valid)))]
        for i, pad in enumerate(down_pads):
            w = jnp.zeros((27, tt.channels, 8), jnp.float32)
            tt = ts.sparse_conv3d_tile(tt, w, stride=2, padding=pad,
                                       out_capacity=caps[i + 1],
                                       rule='spconv')
            counts.append(int(np.sum(np.asarray(tt.valid))))
        return counts

    demand = march([32768] * 4)
    got = march(sched)
    names = ['input', 'after down0', 'after down1', 'after down2']
    print(f'{"stage":14s} {"demand":>7s} {"capacity":>9s} {"active":>8s} '
          f'{"dropped":>8s} {"margin":>7s}')
    for name, d, c, a in zip(names, demand, sched, got):
        print(f'{name:14s} {d:7d} {c:9d} {a:8d} {max(d - a, 0):8d} '
              f'{c / max(d, 1):6.2f}x')


if __name__ == '__main__':
    main()
