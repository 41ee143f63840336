from .camera_shard import camera_batch_shardings, predict_cam_sharded
from .pipeline import make_pipeline
from .spatial_bev import (halo_conv2d, halo_exchange, make_sharded_trunk,
                          shard_bev, spatial_conv_trunk, unshard_bev)
from .tensor_parallel import (make_tp_attention, make_tp_mlp,
                              shard_cols, shard_rows, tp_attention, tp_mlp)

__all__ = ['halo_conv2d', 'halo_exchange', 'make_sharded_trunk',
           'shard_bev', 'spatial_conv_trunk', 'unshard_bev',
           'make_tp_attention', 'make_tp_mlp', 'shard_cols', 'shard_rows',
           'tp_attention', 'tp_mlp', 'make_pipeline',
           'camera_batch_shardings', 'predict_cam_sharded']
