from multiposenet_tpu.utils.logging import get_logger
from multiposenet_tpu.utils.meters import AverageValueMeter
from multiposenet_tpu.utils.timer import Timer
