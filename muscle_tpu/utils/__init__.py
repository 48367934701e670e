from muscle_tpu.utils.timers import Timer, AverageMeter
from muscle_tpu.utils.logging import Logger, MetricLogger
