from automoe_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from automoe_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
