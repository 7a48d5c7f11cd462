from automoe_tpu.ops.boxes import (  # noqa: F401
    box_convert,
    box_iou,
    generalized_box_iou,
    bev_from_3d,
)
from automoe_tpu.ops.matching import hungarian_match, match_cost_matrix  # noqa: F401
from automoe_tpu.ops.auction import auction_match  # noqa: F401
from automoe_tpu.ops.resize import resize_bilinear, resize_weights  # noqa: F401
from automoe_tpu.ops.masked import (  # noqa: F401
    masked_cross_entropy,
    masked_smooth_l1,
    smooth_l1,
)
