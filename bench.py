"""tvc benchmark: defended queries/sec + detection AUROC on one TPU chip.

Workload (BASELINE.json config #1): CLIP ViT-B/32 cosine-consistency
detector with pre-generated text variants (no Qwen/SD): per query
  1x image encode (224x224) + V=6 variant/original text encodes
  + bank top-k (131072 x 512 exact matmul) + fused Pallas consistency kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: reference 52.3 defended q/s on 6x RTX 4090 (README.md:891-897).

Notes: weights are random (zero-egress environment) — identical FLOPs to
pretrained weights, so throughput is faithful; AUROC is measured on
PGD-attacked vs clean queries under the same detector. Inputs are generated
on device and reused across timing iterations (measures sustained device
throughput; host input pipelining is a separate axis).
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tvc.core.pallas import fused_consistency_scores
    from tvc.core.similarity import l2_normalize
    from tvc.models import CLIPConfig, CLIPModel
    from tvc.models.clip import CLIPModule, normalize_pixels

    backend = jax.default_backend()
    log(f"backend: {backend} devices: {jax.devices()}")

    import dataclasses

    small = "--small" in sys.argv
    cfg = CLIPConfig.tiny() if small else dataclasses.replace(
        CLIPConfig(), fused_attention=True
    )
    B = 64 if small else 256
    V = 6
    K = 10
    BANK_N = 4096 if small else 131072
    model = CLIPModel(cfg, seed=0)
    module = model.inference_module
    D = cfg.embed_dim

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pixels = jax.random.uniform(k1, (B, cfg.image_size, cfg.image_size, 3))
    tokens = jnp.asarray(
        model.tokenize([f"a photo of scene number {i} with objects" for i in range(B)])
    )
    variant_tokens = jnp.asarray(
        np.stack(
            [
                model.tokenize(
                    [f"variant {v} of scene {i} with objects" for v in range(V)]
                )
                for i in range(B)
            ]
        )
    )  # [B, V, T]
    # sequence bucketing: captions are short; the text tower is
    # length-polymorphic (positional embeddings sliced, causal mask [T, T]),
    # so encode at the smallest 32-multiple covering the real tokens instead
    # of the full 77-token context — text FLOPs drop ~2.4x.
    real_len = int(
        max(
            (np.asarray(tokens) != 0).sum(-1).max(),
            (np.asarray(variant_tokens) != 0).sum(-1).max(),
        )
    )
    T_b = min(((real_len + 31) // 32) * 32, tokens.shape[-1])
    tokens = tokens[:, :T_b]
    variant_tokens = variant_tokens[:, :, :T_b]
    log(f"text bucket: {T_b} tokens (real max {real_len})")
    bank = l2_normalize(jax.random.normal(k2, (BANK_N, D)))

    params = model.params

    def _defended_core(params, pixels, tokens, variant_tokens, bank):
        img = l2_normalize(
            module.apply(
                {"params": params}, normalize_pixels(pixels), method=CLIPModule.encode_image
            )
        )
        txt = l2_normalize(
            module.apply({"params": params}, tokens, method=CLIPModule.encode_text)
        )
        b, v, t = variant_tokens.shape
        var = l2_normalize(
            module.apply(
                {"params": params},
                variant_tokens.reshape(b * v, t),
                method=CLIPModule.encode_text,
            )
        ).reshape(b, v, -1)
        # retrieval references: exact top-k over the bank (one MXU matmul);
        # text-query retrieval (the text fetches what the image SHOULD look
        # like, reference src/pipeline.py:441-472)
        sims = jnp.dot(txt, bank.T, preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(sims, K)
        refs = jnp.take(bank, idx.reshape(-1), axis=0).reshape(b, K, -1)
        out = fused_consistency_scores(img, txt, var, refs)
        return out["aggregated"], out["is_adversarial"]

    defended_step = jax.jit(_defended_core)

    # Timing protocol for the axon tunnel: dispatches are async and
    # block_until_ready does NOT synchronize — only a device->host readback
    # does, and each dispatch+readback pays ~30ms tunnel RTT. So we chain K
    # steps inside ONE jitted fori_loop (with an i-dependent input so XLA
    # cannot hoist the loop body) and do a single readback. K is a traced
    # bound (lowers to while_loop) so we can scale it until the measured
    # window dwarfs the RTT without recompiling.
    @jax.jit
    def defended_k(params, pixels, tokens, variant_tokens, bank, k):
        def body(i, acc):
            px = pixels + i.astype(jnp.float32) * 1e-9  # defeat loop-invariant hoisting
            agg, flags = _defended_core(params, px, tokens, variant_tokens, bank)
            return acc + jnp.sum(agg)

        return jax.lax.fori_loop(0, k, body, 0.0)

    # measure tunnel RTT to subtract it
    tiny = jax.jit(lambda x: x + 1.0)
    z = tiny(jnp.zeros((8, 8)))
    _ = float(z[0, 0])
    t0 = time.time()
    for _ in range(5):
        z = tiny(z)
        _ = float(z[0, 0])
    rtt = (time.time() - t0) / 5
    log(f"tunnel RTT: {rtt * 1e3:.1f} ms")

    log("compiling defended step (single + K-chained)...")
    t0 = time.time()
    agg, flags = defended_step(params, pixels, tokens, variant_tokens, bank)
    _ = float(agg[0])
    log(f"single-step compile+run: {time.time() - t0:.1f}s")
    t0 = time.time()
    acc = defended_k(params, pixels, tokens, variant_tokens, bank, 2)
    _ = float(acc)
    log(f"K-chained compile+run: {time.time() - t0:.1f}s")

    def measure(k):
        t0 = time.time()
        acc = defended_k(params, pixels, tokens, variant_tokens, bank, k)
        _ = float(acc)
        return time.time() - t0

    # scale K until the window is >= 30x RTT (>= ~1s), then measure
    K = 4
    elapsed = measure(K)
    while elapsed < max(30 * rtt, 1.0) and K < 4096:
        K = int(K * max(2.0, min(16.0, (max(30 * rtt, 1.0) * 1.5) / max(elapsed, 1e-3))))
        elapsed = measure(K)
    elapsed = max(elapsed - rtt, 1e-9)
    qps = B * K / elapsed
    log(
        f"defended throughput: {qps:.1f} q/s "
        f"({elapsed / K * 1e3:.2f} ms/batch of {B}, {K} chained steps, "
        f"window {elapsed:.2f}s)"
    )

    # detection AUROC: PGD-attacked vs clean under the same scores
    from tvc.attacks.pgd import PGDAttackConfig, _pgd_run
    from tvc.metrics import DetectionEvaluator

    n_adv = min(B, 64)
    atk_cfg = PGDAttackConfig(num_steps=10)

    grad_module = model.module  # einsum attention (fused kernel has no VJP)

    def encode(p, px):
        return l2_normalize(
            grad_module.apply(
                {"params": p}, normalize_pixels(px), method=CLIPModule.encode_image
            )
        )

    txt_feats = l2_normalize(
        module.apply({"params": params}, tokens[:n_adv], method=CLIPModule.encode_text)
    )
    log("compiling + running PGD...")
    t0 = time.time()
    run = jax.jit(lambda p, px, tf, k: _pgd_run(encode, atk_cfg, p, px, tf, tf, k))
    adv, _ = run(params, pixels[:n_adv], txt_feats, k3)
    jax.block_until_ready(adv)
    log(f"PGD done: {time.time() - t0:.1f}s")

    clean_agg, _ = defended_step(params, pixels, tokens, variant_tokens, bank)
    adv_pixels = jnp.concatenate([adv, pixels[n_adv:]], axis=0)
    adv_agg, _ = defended_step(params, adv_pixels, tokens, variant_tokens, bank)
    labels = np.concatenate([np.zeros(n_adv), np.ones(n_adv)])
    scores = np.concatenate(
        [np.asarray(clean_agg[:n_adv]), np.asarray(adv_agg[:n_adv])]
    )
    auroc = DetectionEvaluator.auroc(labels, scores)
    log(f"detection AUROC (PGD vs clean): {auroc:.4f}")

    baseline_qps = 52.3  # reference, 6x RTX 4090 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "defended_queries_per_sec",
                "value": round(float(qps), 2),
                "unit": "queries/s",
                "vs_baseline": round(float(qps) / baseline_qps, 3),
                "auroc_pgd": round(float(auroc), 4),
                "batch_size": B,
                "bank_size": BANK_N,
                "backend": backend,
                "model": cfg.model_name,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent))
    try:
        main()
    except Exception as e:  # always emit a JSON line for the driver
        print(
            json.dumps(
                {
                    "metric": "defended_queries_per_sec",
                    "value": 0.0,
                    "unit": "queries/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            ),
            flush=True,
        )
        raise
