from serendipity_tpu.train.device import DeviceData, build_device_data  # noqa: F401
from serendipity_tpu.train.bpr import BPRTrainer, TrainState  # noqa: F401
from serendipity_tpu.train.evaluator import Evaluator  # noqa: F401
