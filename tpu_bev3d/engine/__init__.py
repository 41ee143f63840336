from .optim import build_optimizer, build_schedule
from .train_state import TrainState, create_train_state
from .train_loop import make_train_step, make_eval_step, shard_batch

__all__ = ['build_optimizer', 'build_schedule', 'TrainState',
           'create_train_state', 'make_train_step', 'make_eval_step',
           'shard_batch']
