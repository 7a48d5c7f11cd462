from automoe_tpu.infer.controllers import PID, pure_pursuit_steer, to_finite_float  # noqa: F401
from automoe_tpu.infer.engine import InferenceEngine  # noqa: F401
