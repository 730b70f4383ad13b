"""Tensor-parallel Qwen: sharded forward == single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tvc.models.qwen import QwenConfig, QwenModel
from tvc.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tvc.parallel.tp import make_tp_forward, qwen_param_specs, shard_qwen_params


@pytest.fixture(scope="module")
def model():
    # heads=4, kv=2: shardable 2-way over the model axis
    return QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=4)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), (DATA_AXIS, MODEL_AXIS))


def test_param_specs_layout(model):
    specs = qwen_param_specs(model.params)
    assert specs["layer_0"]["attn"]["q"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["layer_0"]["attn"]["o"]["kernel"] == P(MODEL_AXIS, None)
    assert specs["layer_0"]["mlp"]["down"]["kernel"] == P(MODEL_AXIS, None)
    assert specs["layer_0"]["ln_attn"]["scale"] == P()
    assert specs["embed"]["embedding"] == P(MODEL_AXIS, None)


@pytest.mark.slow
def test_tp_forward_matches_single_device(model, mesh):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(1, model.config.vocab_size - 4, size=(2, 6)), jnp.int32
    )
    sharded = shard_qwen_params(model.params, mesh)
    # verify real sharding happened (q kernel split over 2 devices)
    qk = sharded["layer_0"]["attn"]["q"]["kernel"]
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    full = model.params["layer_0"]["attn"]["q"]["kernel"].shape
    assert any(ss[1] == full[1] // 2 for ss in shard_shapes)

    tp_forward = make_tp_forward(model, mesh)
    got = np.asarray(tp_forward(sharded, tokens))

    T = tokens.shape[1]
    positions = jnp.broadcast_to(jnp.arange(T), tokens.shape)
    mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)[None, None]
    want, _ = model.module.apply({"params": model.params}, tokens, positions, mask)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_tp_qwen_decode_matches_single_device(mesh):
    """Full KV-cached decode with TP-sharded params == unsharded decode."""
    single = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6)
    tp = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6, mesh=mesh)
    prompts = ["a cat sat on the mat", "two dogs run"]
    a = single.generate(prompts, temperature=0.0)
    b = tp.generate(prompts, temperature=0.0)
    assert a == b
