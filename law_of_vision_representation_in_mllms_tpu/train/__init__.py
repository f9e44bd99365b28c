from .train_step import (TrainConfig, make_train_step, init_train_state,
                         init_sharded_train_state)
