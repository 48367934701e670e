from muscle_tpu.models.efficientnet import EfficientNet, efficientnet_config
from muscle_tpu.models.muscle import MuSCLe, PYRAMID_TABLE
from muscle_tpu.models.resnet50 import ResNet50
from muscle_tpu.models.irn import EdgeDisplacement, IRNNet
