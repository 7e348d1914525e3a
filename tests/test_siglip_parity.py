"""SigLIP architecture parity vs HF torch SiglipModel (random init, ported
weights, forward comparison) — the "hard part" flagged by SURVEY §7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


def test_siglip_towers_match_hf_torch():
    from transformers import SiglipConfig, SiglipModel

    from multimodal_clinical_tpu.models.siglip import (
        SigLIPModel,
        port_siglip_state_dict,
    )

    torch.manual_seed(0)
    tm = SiglipModel(SiglipConfig()).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 32000, size=(2, 64)).astype(np.int64)
    px = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids),
                 pixel_values=torch.tensor(px))
    want_text = out.text_embeds.numpy()
    want_image = out.image_embeds.numpy()

    module = SigLIPModel()  # fp32 for the comparison
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.asarray(ids.astype(np.int32)),
                            jnp.zeros((2, 224, 224, 3)), train=False)
    params = port_siglip_state_dict(tm.state_dict(), variables["params"])
    got_text, got_image = module.apply(
        {"params": params},
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got_text), want_text,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_image), want_image,
                               rtol=5e-3, atol=5e-3)
