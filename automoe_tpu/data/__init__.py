from automoe_tpu.data.loader import DataLoader, ShardedSampler  # noqa: F401
from automoe_tpu.data.packed import (  # noqa: F401
    PackedFrameDataset,
    PackedSequenceDataset,
    pack_carla_sequences,
    pack_frames,
)
from automoe_tpu.data.factories import (  # noqa: F401
    get_bdd_detection_loader,
    get_bdd_drivable_loader,
    get_bdd_segmentation_loader,
    get_carla_detection_loader,
    get_carla_drivable_loader,
    get_carla_segmentation_loader,
    get_carla_sequence_loader,
    get_nuscenes_loader,
)
