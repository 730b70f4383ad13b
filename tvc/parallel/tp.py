"""Tensor-parallel sharding rules for the Qwen2 LM.

The reference has no TP (SURVEY.md §2.4: "optional pjit param sharding for
Qwen2-7B"); at 7B params (~14 GB bf16) a single v5e chip (16 GB HBM) needs
it for the paraphrase model. GSPMD-style: we give every parameter a
PartitionSpec (Megatron layout — attention heads and MLP intermediate
sharded over the ``model`` axis, row-parallel output projections) and jit
the unchanged QwenLM forward with those shardings; XLA inserts the
all-reduces.

Layout (per layer):
  q/k/v kernels  [H, heads*Dh]   -> shard output dim  P(None, "model")
  o kernel       [heads*Dh, H]   -> shard input dim   P("model", None)
  gate/up        [H, I]          -> P(None, "model")
  down           [I, H]          -> P("model", None)
  embed          [V, H]          -> P("model", None)   (vocab-sharded)
  norms/biases small             -> replicated
GQA note: num_kv_heads must divide the model-axis size (Qwen2-7B: 4 kv
heads -> up to 4-way TP; q heads 28 shard 4-way cleanly).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvc.parallel.mesh import MODEL_AXIS


def qwen_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a QwenLM param tree."""

    def spec_for(path: str, leaf) -> P:
        if leaf.ndim < 2:
            return P()  # biases, norm scales
        if "embed" in path:
            return P(MODEL_AXIS, None)  # vocab-sharded embedding
        if "/attn/q/" in path or "/attn/k/" in path or "/attn/v/" in path:
            return P(None, MODEL_AXIS)  # column-parallel
        if "/attn/o/" in path:
            return P(MODEL_AXIS, None)  # row-parallel
        if "/mlp/gate/" in path or "/mlp/up/" in path:
            return P(None, MODEL_AXIS)
        if "/mlp/down/" in path:
            return P(MODEL_AXIS, None)
        if "lm_head" in path:
            return P(None, MODEL_AXIS)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        path_str = "/" + "/".join(
            getattr(k, "key", str(k)) for k in path
        ) + "/"
        specs.append(spec_for(path_str, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def _bias_fixup(path_str: str, spec: P, mesh_size: int, leaf) -> P:
    """q/k/v biases are per-output-feature: shard when divisible."""
    if (
        ("/attn/q/" in path_str or "/attn/k/" in path_str or "/attn/v/" in path_str)
        and leaf.ndim == 1
        and leaf.shape[0] % mesh_size == 0
    ):
        return P(MODEL_AXIS)
    return spec


def shard_qwen_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a QwenLM param tree on the mesh with TP shardings.

    Validates divisibility (kv heads vs axis size) and returns the sharded
    pytree; pair with jitted QwenLM.apply — XLA handles the collectives.
    """
    axis = mesh.shape[MODEL_AXIS]
    specs = qwen_param_specs(params)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s, treedef = jax.tree_util.tree_flatten(specs)
    out = []
    for (path, leaf), spec in zip(flat_p, flat_s):
        path_str = "/" + "/".join(getattr(k, "key", str(k)) for k in path) + "/"
        spec = _bias_fixup(path_str, spec, axis, leaf)
        # drop shardings that don't divide (e.g. tiny test configs)
        ok = True
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % axis != 0:
                ok = False
        final = spec if ok else P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, final)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_stacked_qwen_layers(stacked: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """TP-shard the decode's STACKED layer tree ([L, ...] leaves, one
    QwenBlock param structure — tvc/models/qwen.QwenModel._decode_state).

    Same Megatron layout as qwen_param_specs with a leading replicated L
    dim, and int8-aware: quantized leaves are {"int8": [L, in, out],
    "scale": [L, out]} — int8 shards like its kernel, the per-output
    scale shards with the column-parallel output dim (this is the int8xTP
    composition round 2 left as NotImplementedError)."""
    axis = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        ps = "/" + "/".join(getattr(k, "key", str(k)) for k in path) + "/"
        col = any(t in ps for t in ("/q/", "/k/", "/v/", "/gate/", "/up/"))
        row = any(t in ps for t in ("/o/", "/down/"))
        last = getattr(path[-1], "key", "")
        spec = P()
        if col:
            if last in ("kernel", "int8") and leaf.ndim == 3:
                spec = P(None, None, MODEL_AXIS)  # output-dim sharded
            elif last in ("bias", "scale") and leaf.ndim == 2:
                spec = P(None, MODEL_AXIS)  # per-output-feature vectors
        elif row:
            if last in ("kernel", "int8") and leaf.ndim == 3:
                spec = P(None, MODEL_AXIS, None)  # input-dim sharded
            # row-parallel scale is per-OUTPUT column [L, H]: replicated
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % axis != 0:
                spec = P()  # tiny test configs: drop non-divisible shardings
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, stacked)


def make_tp_forward(model, mesh: Mesh):
    """Jitted TP forward: (sharded_params, tokens [B, T]) -> logits.

    Tokens/positions replicated; logits replicated (XLA all-reduces the
    row-parallel matmuls and all-gathers the vocab-sharded lm head).
    """
    import jax.numpy as jnp

    module = model.module

    def forward(params, tokens):
        T = tokens.shape[1]
        positions = jnp.broadcast_to(jnp.arange(T), tokens.shape)
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)[None, None]
        logits, _ = module.apply({"params": params}, tokens, positions, mask)
        return logits

    return jax.jit(forward, out_shardings=NamedSharding(mesh, P()))
