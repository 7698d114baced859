from declip_tpu.utils.meters import AverageMeter, MeterGroup  # noqa: F401
from declip_tpu.utils.logging import create_logger, ScalarWriter  # noqa: F401
