"""Round-trip: flax → torch state dict → flax must be the identity, and
the exported dict must load into the ACTUAL reference AutoMoE."""
from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()

from automoe_tpu.ckpt import import_automoe  # noqa: E402
from automoe_tpu.ckpt.torch_export import export_automoe_state_dict  # noqa: E402
from automoe_tpu.configs import load_model_config  # noqa: E402
from automoe_tpu.models import create_automoe_model  # noqa: E402
from automoe_tpu.utils import jit_init  # noqa: E402
from tests.test_full_automoe_parity import CONFIG  # noqa: E402


@pytest.mark.slow
def test_export_roundtrip_and_reference_load(rng):
    cfg = load_model_config(CONFIG)
    model = create_automoe_model(cfg)
    B = 1
    batch = {
        "image": jnp.zeros((B, 64, 64, 3), jnp.float32),
        "speed": jnp.zeros((B, 1), jnp.float32),
        "steering": jnp.zeros((B, 1), jnp.float32),
        "throttle": jnp.zeros((B, 1), jnp.float32),
        "brake": jnp.zeros((B, 1), jnp.float32),
    }
    variables = jit_init(model, jax.random.key(3), batch)

    sd = export_automoe_state_dict(variables, cfg)
    reimported = import_automoe(sd, cfg)

    flat_a = flax.traverse_util.flatten_dict(variables["params"])
    flat_b = flax.traverse_util.flatten_dict(reimported["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k)
        )
    sa = flax.traverse_util.flatten_dict(variables["batch_stats"])
    sb = flax.traverse_util.flatten_dict(reimported["batch_stats"])
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]))

    # the exported dict loads into the actual reference model, strict
    from models.automoe import create_automoe_model as ref_create

    tmodel = ref_create(CONFIG, device="cpu")
    tsd = {k: torch.from_numpy(np.ascontiguousarray(np.atleast_1d(v)).copy())
           if np.ndim(v) == 0 else torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    tsd = {k: (v.reshape(()) if "num_batches_tracked" in k else v)
           for k, v in tsd.items()}
    missing, unexpected = tmodel.load_state_dict(tsd, strict=False)
    assert not unexpected, unexpected
    # only num_batches_tracked-style buffers may be missing
    assert all("num_batches_tracked" in m for m in missing), missing
