from muscle_tpu.training.state import (
    TrainState,
    create_train_state,
    save_checkpoint,
    restore_checkpoint,
    load_model_msgpack,
)
from muscle_tpu.training.schedule import ReduceLROnPlateau, poly_schedule
from muscle_tpu.training.mcl import (
    MCLConfig,
    mcl_term_grad_norms,
    mcl_train_step,
    mcl_views_step,
)
from muscle_tpu.training.seg import SegConfig, seg_term_grad_norms, seg_train_step
from muscle_tpu.training.irn import IRNTrainConfig, irn_train_step
