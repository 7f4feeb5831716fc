from pose2room_tpu.train.state import TrainState, create_train_state, epoch_lr, apply_lr_schedule, OptimizerInfo
from pose2room_tpu.train.step import make_train_step, make_eval_step
from pose2room_tpu.train.checkpoint import CheckpointIO
