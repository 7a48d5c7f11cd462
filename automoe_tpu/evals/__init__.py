from automoe_tpu.evals.detection import detection_eval_batch, evaluate_detection  # noqa: F401
from automoe_tpu.evals.segmentation import evaluate_seg_like, seg_eval_batch  # noqa: F401
from automoe_tpu.evals.nuscenes import evaluate_nuscenes  # noqa: F401
from automoe_tpu.evals.gating import evaluate_automoe  # noqa: F401
