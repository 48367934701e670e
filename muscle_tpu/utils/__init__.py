from muscle_tpu.utils.timers import Timer, AverageMeter
from muscle_tpu.utils.logging import Logger, MetricLogger
from muscle_tpu.utils.metrics import topk_accuracy
from muscle_tpu.utils.visualize import jet_colormap, show_cam_on_image
from muscle_tpu.utils.train_vis import TrainVisualizer
from muscle_tpu.utils.compile_cache import enable as enable_compile_cache
