from declip_tpu.train.state import TrainState, new_train_state  # noqa: F401
from declip_tpu.train.ema import EmaConfig, init_ema, ema_step  # noqa: F401
from declip_tpu.train.train_step import make_train_step, method_of  # noqa: F401
