from automoe_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from automoe_tpu.train.step import (  # noqa: F401
    make_eval_step,
    make_scan_train_step,
    make_train_step,
)
