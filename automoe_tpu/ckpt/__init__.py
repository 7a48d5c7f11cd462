from automoe_tpu.ckpt.torch_export import (  # noqa: F401
    export_automoe_state_dict,
    save_torch_checkpoint,
)
from automoe_tpu.ckpt.torch_import import (  # noqa: F401
    import_automoe,
    import_context,
    import_detection_expert,
    import_drivable_expert,
    import_extractor,
    import_gating,
    import_nuscenes_2d_head,
    import_nuscenes_expert,
    import_policy,
    import_segmentation_expert,
    load_torch_state_dict,
)
