"""Golden parity: our JAX CLIP text tower vs HF transformers (torch CPU),
with converted random weights — verifies both the module math and the
weight-conversion rules in one shot."""
import numpy as np
import pytest

from latentblending_tpu.models.clip import CLIPTextEncoder
from latentblending_tpu.models.configs import TINY_CLIP, TINY_CLIP_PROJ
from latentblending_tpu.models.weights import convert_clip_state_dict, torch_state_dict_to_numpy


def _hf_model(with_projection: bool):
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel, CLIPTextModelWithProjection

    cfg = TINY_CLIP_PROJ if with_projection else TINY_CLIP
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=0,
        pad_token_id=1,
        projection_dim=cfg.projection_dim or 512,
    )
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    model = cls(hf_cfg).eval()
    return model, cfg


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_matches_transformers(with_projection):
    import torch

    model, cfg = _hf_model(with_projection)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size - 1, size=(2, 77))
    ids[:, 0] = 0
    ids[0, 10] = cfg.eos_token_id  # EOS mid-sequence
    ids[1, 76] = cfg.eos_token_id

    with torch.no_grad():
        hf_out = model(torch.tensor(ids), output_hidden_states=True)
    hf_penultimate = hf_out.hidden_states[-2].numpy()
    hf_last = hf_out.last_hidden_state.numpy()
    if with_projection:
        hf_pooled = hf_out.text_embeds.numpy()
    else:
        hf_pooled = hf_out.pooler_output.numpy()

    params = convert_clip_state_dict(torch_state_dict_to_numpy(model))
    enc = CLIPTextEncoder(cfg)
    pen, last, pooled = enc.apply({"params": params}, np.asarray(ids))

    np.testing.assert_allclose(np.asarray(pen), hf_penultimate, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(last), hf_last, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), hf_pooled, atol=2e-5, rtol=1e-4)
