from .optim import build_optimizer, build_schedule
from .train_state import TrainState, create_train_state
from .train_loop import (make_train_step, make_eval_step, shard_batch,
                         data_mesh, replicate_state, init_distributed,
                         global_data_mesh, shard_host_local_batch)

__all__ = ['build_optimizer', 'build_schedule', 'TrainState',
           'create_train_state', 'make_train_step', 'make_eval_step',
           'shard_batch', 'data_mesh', 'replicate_state',
           'init_distributed', 'global_data_mesh',
           'shard_host_local_batch']
