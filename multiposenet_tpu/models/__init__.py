from multiposenet_tpu.models.fpn import ResNetFPN, FPNFeatures
from multiposenet_tpu.models.subnets import (
    ClassificationHead,
    KeypointHead,
    PRN,
    RegressionHead,
)
from multiposenet_tpu.models.posenet import PoseNet
