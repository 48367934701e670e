from muscle_tpu.inference.cam import CamTTAEngine
from muscle_tpu.inference.seg import SegTTAEngine
from muscle_tpu.inference.irn import RandomWalkRefiner
