from .spatial_bev import (halo_conv2d, halo_exchange, make_sharded_trunk,
                          shard_bev, spatial_conv_trunk, unshard_bev)

__all__ = ['halo_conv2d', 'halo_exchange', 'make_sharded_trunk',
           'shard_bev', 'spatial_conv_trunk', 'unshard_bev']
