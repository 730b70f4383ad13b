"""SPMD step builders: defended-inference and CLIP training steps over a mesh.

The reference has no training loop and scales inference by GPU replication
(SURVEY.md §2.4). Here both directions are first-class SPMD programs:

* ``make_defense_step`` — one jitted step of the full TVC defense: CLIP
  image+text encode (batch sharded over ``data``), exact bank top-k (bank
  rows sharded over ``model`` via shard_map + all_gather merge), fused
  consistency scoring. This is the serving hot path.
* ``make_train_step`` — CLIP contrastive (InfoNCE) fine-tuning step:
  batch sharded over ``data``, parameters replicated; XLA inserts the
  gradient psum from the shardings. Covers the checkpoint/fine-tune story
  the reference lacks entirely.

Both run identically on a real TPU slice and on the virtual CPU mesh
(tests + the driver's ``dryrun_multichip``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvc.core import consistency as C
from tvc.core.similarity import batched_set_cosine, cosine_similarity, l2_normalize
from tvc.models.clip import CLIPModel, CLIPModule, normalize_pixels
from tvc.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_defense_step(
    model: CLIPModel,
    mesh: Mesh,
    bank_rows_per_shard: int,
    top_k: int = 5,
    threshold: float = C.DEFAULT_THRESHOLD,
) -> Callable:
    """Returns jitted ``step(params, pixels, tokens, variant_tokens, bank)``.

    pixels [B, H, W, 3] raw [0,1]; tokens [B, T]; variant_tokens [B, V, T];
    bank [S*rows, D] row-sharded over MODEL_AXIS.
    Outputs: (is_adversarial [B], aggregated [B], topk_idx [B, k]).
    """
    module = model.module

    def encode_image(params, px):
        return l2_normalize(
            module.apply({"params": params}, normalize_pixels(px), method=CLIPModule.encode_image)
        )

    def encode_text(params, tok):
        return l2_normalize(
            module.apply({"params": params}, tok, method=CLIPModule.encode_text)
        )

    def bank_topk(queries, bank_shard):
        sims = jnp.dot(queries, bank_shard.T, preferred_element_type=jnp.float32)
        scores, idx = jax.lax.top_k(sims, top_k)
        shard_id = jax.lax.axis_index(MODEL_AXIS)
        gidx = idx + shard_id * bank_rows_per_shard
        all_scores = jax.lax.all_gather(scores, MODEL_AXIS, axis=1)
        all_idx = jax.lax.all_gather(gidx, MODEL_AXIS, axis=1)
        B = all_scores.shape[0]
        top_scores, pos = jax.lax.top_k(all_scores.reshape(B, -1), top_k)
        top_idx = jnp.take_along_axis(all_idx.reshape(B, -1), pos, axis=1)
        return top_scores, top_idx

    sharded_topk = jax.shard_map(
        bank_topk,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, pixels, tokens, variant_tokens, bank):
        img = encode_image(params, pixels)  # [B, D]
        txt = encode_text(params, tokens)  # [B, D]
        B, V, T = variant_tokens.shape
        var = encode_text(params, variant_tokens.reshape(B * V, T)).reshape(B, V, -1)

        ref_scores, ref_idx = sharded_topk(img, bank)  # retrieval refs
        refs = jnp.take(bank, ref_idx.reshape(-1), axis=0).reshape(B, top_k, -1)

        orig = cosine_similarity(img, txt)
        vsims = batched_set_cosine(img, var)
        rsims = batched_set_cosine(img, refs)
        flags, agg, _ = C.detect(orig, vsims, rsims, threshold=threshold)
        return flags, agg, ref_idx

    data_nd = lambda ndim: NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return jax.jit(
        step,
        in_shardings=(
            NamedSharding(mesh, P()),  # params replicated
            data_nd(4),
            data_nd(2),
            data_nd(3),
            NamedSharding(mesh, P(MODEL_AXIS, None)),  # bank rows sharded
        ),
        out_shardings=(
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(DATA_AXIS)),
            data_nd(2),
        ),
    )


def make_train_step(
    model: CLIPModel,
    mesh: Mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Tuple[Callable, Any]:
    """CLIP contrastive training step, data-parallel over the mesh.

    Returns (jitted step, initial optimizer state). Loss is symmetric
    InfoNCE over the global batch (logits [B, B] computed from sharded
    embeddings — XLA all-gathers as needed from the shardings).
    """
    module = model.module
    optimizer = optimizer or optax.adamw(1e-5)
    opt_state = optimizer.init(model.params)

    def loss_fn(params, pixels, tokens):
        img, txt, logits = module.apply(
            {"params": params}, normalize_pixels(pixels), tokens
        )
        B = logits.shape[0]
        labels = jnp.arange(B)
        li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        return 0.5 * (li + lt)

    def step(params, opt_state, pixels, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixels, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    repl = NamedSharding(mesh, P())
    data4 = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, data4, data2),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    return jitted, opt_state
