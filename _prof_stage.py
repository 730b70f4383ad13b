"""Honest per-stage breakdown of the int8 defended step (K-chained,
i-dependent inputs; bench.py protocol) on the real TPU."""
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
from tvc.models.clip import CLIPConfig, CLIPModel, normalize_pixels, quantize_clip_params
from tvc.core.similarity import l2_normalize

cfg = dataclasses.replace(CLIPConfig(), fused_attention=True, int8_serving=True)
model = CLIPModel(cfg, seed=0)
params = jax.device_put(model.params)
B, V, T = 256, 6, 16
BANK_N = 131072
key = jax.random.PRNGKey(0)
pixels = jax.device_put(jax.random.uniform(key, (B, 224, 224, 3)))
tokens = jax.device_put(jax.random.randint(jax.random.PRNGKey(1), (B, T), 1, 40000))
vtok = jax.device_put(jax.random.randint(jax.random.PRNGKey(2), (B, V, T), 1, 40000))
bank = l2_normalize(jax.random.normal(jax.random.PRNGKey(3), (BANK_N, cfg.embed_dim)))
bank = jax.device_put(bank)

K = 40
RTT = 0.045

def kchain(body_fn, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            return body_fn(i, carry, *a[1:])
        return jax.lax.fori_loop(0, K, body, a[0])
    r = run(*args); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.time(); r = run(*args); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    return (time.time() - t0 - RTT) / K * 1000

# image encode
def img_body(i, acc, params, pixels):
    px = jnp.roll(pixels, i, axis=0)
    f = l2_normalize(model.infer_image_features(params, normalize_pixels(px)))
    return acc + f[0]
ms = kchain(img_body, jnp.zeros((cfg.embed_dim,)), params, pixels)
print(f"image encode (B={B}): {ms:.2f} ms", flush=True)

# text encode originals+variants together
def txt_body(i, acc, params, tokens, vtok):
    tok = jnp.roll(tokens, i, axis=0)
    vt = jnp.roll(vtok, i, axis=0)
    all_tok = jnp.concatenate([tok[:, None, :], vt], axis=1).reshape(B * (V + 1), T)
    f = l2_normalize(model.infer_text_features(params, all_tok))
    return acc + f[0]
ms = kchain(txt_body, jnp.zeros((cfg.embed_dim,)), params, tokens, vtok)
print(f"text encode (B*(V+1)={B*(V+1)} seqs, T={T}): {ms:.2f} ms", flush=True)

# bank top-k
def topk_body(i, acc, bank):
    q = l2_normalize(acc[None, :] + jax.random.normal(jax.random.PRNGKey(0), (B, cfg.embed_dim)) * (1e-6 * i.astype(jnp.float32) + 1))
    sims = jnp.dot(q, bank.T, preferred_element_type=jnp.float32)
    s, idx = jax.lax.top_k(sims, 5)
    return acc + s[0, 0] * 1e-6 + jnp.zeros((cfg.embed_dim,)).at[0].set(idx[0, 0].astype(jnp.float32) * 1e-9)
ms = kchain(topk_body, jnp.zeros((cfg.embed_dim,)), bank)
print(f"bank top-k (131k): {ms:.2f} ms", flush=True)
