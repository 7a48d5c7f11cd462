from automoe_tpu.losses.detection import detection_set_loss, scatter_matched_targets  # noqa: F401
from automoe_tpu.losses.segmentation import segmentation_loss  # noqa: F401
from automoe_tpu.losses.nuscenes import nuscenes_set_loss  # noqa: F401
from automoe_tpu.losses.trajectory import gating_losses, policy_losses  # noqa: F401
