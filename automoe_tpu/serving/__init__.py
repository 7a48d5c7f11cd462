from automoe_tpu.serving.export import (  # noqa: F401
    ArtifactEngine,
    export_serving_step,
    load_serving_step,
    save_serving_artifact,
    save_serving_bundle,
)
from automoe_tpu.serving.server import (  # noqa: F401
    BatchingServer,
    Client,
    serve_tcp,
)
from automoe_tpu.serving.quant import (  # noqa: F401
    calibrate_automoe,
    fold_resnet,
    make_quant_forward,
    quantize_automoe,
    quantize_folded,
    resnet_float_forward,
    resnet_quant_forward,
    resnet_quant_forward_q8,
)
