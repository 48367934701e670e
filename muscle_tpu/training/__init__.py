from muscle_tpu.training.state import TrainState, create_train_state, save_checkpoint, restore_checkpoint
from muscle_tpu.training.schedule import ReduceLROnPlateau
from muscle_tpu.training.mcl import MCLConfig, mcl_train_step, mcl_views_step
from muscle_tpu.training.seg import SegConfig, seg_train_step
