from automoe_tpu.models.resnet import ResNet18Backbone  # noqa: F401
from automoe_tpu.models.experts import (  # noqa: F401
    BDDDetectionExpert,
    BDDDrivableExpert,
    BDDSegmentationExpert,
    NuScenesExpert,
    PointNet,
    TNet,
)
from automoe_tpu.models.extractors import (  # noqa: F401
    DetectionExpertExtractor,
    DrivableExpertExtractor,
    NuScenesExpertExtractor,
    SegmentationExpertExtractor,
    make_extractor,
)
from automoe_tpu.models.context import (  # noqa: F401
    FullContextExtractor,
    SimpleContextExtractor,
)
from automoe_tpu.models.gating import GatingNetwork  # noqa: F401
from automoe_tpu.models.policy import EasyBackbone, TrajectoryPolicy  # noqa: F401
from automoe_tpu.models.automoe import AutoMoE, create_automoe_model  # noqa: F401
