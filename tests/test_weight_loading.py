"""Numerical parity of tvc Flax models vs HuggingFace torch implementations.

transformers instantiates RANDOM-weight models fully offline; we convert
their state dicts with tvc.models.loaders and check outputs match. This
proves the architectures are exact (so real pretrained checkpoints load
correctly when available)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tvc.models.loaders import (
    convert_clip_state_dict,
    convert_qwen_state_dict,
    load_params,
    save_params,
)


@pytest.fixture(scope="module")
def hf_clip():
    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=16, hidden_act="quick_gelu",
            # align HF's eos-position pooling with tvc's argmax-id (=EOT)
            # convention: make EOT the eos token
            bos_token_id=510, eos_token_id=511, pad_token_id=0,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
            hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


@pytest.mark.slow
def test_clip_parity(hf_clip):
    from tvc.models.clip import CLIPConfig, CLIPModel

    cfg = CLIPConfig.tiny()  # matches the HF config above
    sd = {k: v.float().numpy() for k, v in hf_clip.state_dict().items()}
    params = convert_clip_state_dict(sd, cfg)
    model = CLIPModel(cfg, params=params)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)  # pre-normalized
    tokens = np.zeros((2, 16), np.int64)
    tokens[:, 0] = 510  # sot
    tokens[0, 1:4] = [5, 17, 511]
    tokens[1, 1:6] = [9, 33, 100, 2, 511]

    with torch.no_grad():
        hf_img = hf_clip.get_image_features(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2)
        ).numpy()
        hf_txt = hf_clip.get_text_features(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.ones_like(torch.tensor(tokens)),
        ).numpy()

    got_img = np.asarray(model.image_features(model.params, pixels))
    got_txt = np.asarray(model.text_features(model.params, tokens.astype(np.int32)))
    np.testing.assert_allclose(got_img, hf_img, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got_txt, hf_txt, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_qwen_parity():
    from tvc.models.qwen import QwenConfig, QwenModel

    cfg = QwenConfig.tiny()
    hf_cfg = transformers.Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_seq_len,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    params = convert_qwen_state_dict(sd, cfg)
    model = QwenModel(cfg, params=params, max_new_tokens=4)

    rng = np.random.default_rng(2)
    tokens = rng.integers(1, cfg.vocab_size - 4, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(tokens)).logits.numpy()

    import jax.numpy as jnp

    T = tokens.shape[1]
    positions = jnp.broadcast_to(jnp.arange(T), (2, T))
    mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)[None, None]
    got, _ = model.module.apply(
        {"params": model.params}, jnp.asarray(tokens.astype(np.int32)), positions, mask
    )
    np.testing.assert_allclose(np.asarray(got), hf_logits, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_param_save_load_roundtrip(tmp_path):
    from tvc.models.sd import SDConfig, StableDiffusionModel

    sd = StableDiffusionModel(SDConfig.tiny(), seed=0)
    save_params(sd.params, str(tmp_path / "sd.msgpack"))
    sd2 = StableDiffusionModel(SDConfig.tiny(), seed=99)
    restored = load_params(sd2.params, str(tmp_path / "sd.msgpack"))
    a = sd.generate_image("check", num_images=1, seed=3)[0]
    sd3 = StableDiffusionModel(SDConfig.tiny(), params=restored, seed=0)
    b = sd3.generate_image("check", num_images=1, seed=3)[0]
    np.testing.assert_array_equal(a, b)
