from automoe_tpu.ckpt.torch_import import (  # noqa: F401
    import_automoe,
    import_context,
    import_detection_expert,
    import_drivable_expert,
    import_extractor,
    import_gating,
    import_nuscenes_expert,
    import_policy,
    import_segmentation_expert,
    load_torch_state_dict,
)
