"""Per-layer timing via K-chained fori_loop (bench.py protocol)."""
import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
from tvc.models.clip import CLIPConfig, CLIPModel
from tvc.core.pallas.quantized_layer_kernel import (
    fused_attention_layer_i8, fused_mlp_layer_i8, quantize_linear,
)
from tvc.core.pallas.attention_layer_kernel import (
    fused_attention_layer, fused_mlp_layer,
)

cfg = dataclasses.replace(CLIPConfig(), fused_attention=True)
model = CLIPModel(cfg, seed=0)
params = jax.device_put(model.params)
B, T = 256, 50
W, H = cfg.vision_width, cfg.vision_heads
x0 = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (B, T, W), jnp.float32) * 0.5)

blk = params["visual"]["transformer"]["block_0"]
wqkv_q, sqkv = map(jax.device_put, quantize_linear(blk["attn"]["qkv"]["kernel"]))
wout_q, sout = map(jax.device_put, quantize_linear(blk["attn"]["out"]["kernel"]))
bqkv = blk["attn"]["qkv"]["bias"].astype(jnp.float32)
bout = blk["attn"]["out"]["bias"].astype(jnp.float32)
wfc_q, sfc = map(jax.device_put, quantize_linear(blk["mlp"]["fc"]["kernel"]))
wproj_q, sproj = map(jax.device_put, quantize_linear(blk["mlp"]["proj"]["kernel"]))
bfc = blk["mlp"]["fc"]["bias"].astype(jnp.float32)
bproj = blk["mlp"]["proj"]["bias"].astype(jnp.float32)
ln_s = blk["ln_1"]["scale"]; ln_b = blk["ln_1"]["bias"]
wqkv = blk["attn"]["qkv"]["kernel"]; wout = blk["attn"]["out"]["kernel"]
wfc = blk["mlp"]["fc"]["kernel"]; wproj = blk["mlp"]["proj"]["kernel"]

K = 100
def chain(layer_fn):
    @jax.jit
    def run(x):
        def body(i, acc):
            # make the input depend on i so XLA can't hoist
            y = layer_fn(acc + (i.astype(jnp.float32) * 1e-9))
            return 0.1 * jnp.tanh(y)
        return jax.lax.fori_loop(0, K, body, x)
    return run

def measure(name, layer_fn):
    try:
        f = chain(layer_fn)
        r = f(x0); np.asarray(r)[0, 0, 0]
        t0 = time.time(); r = f(x0); np.asarray(r)[0, 0, 0]
        ms = (time.time() - t0 - 0.045) / K * 1000
        print(f"{name}: {ms:.3f} ms/layer", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)

measure("attn bf16 bb=8", lambda x: fused_attention_layer(
    x, ln_s, ln_b, wqkv, bqkv, wout, bout, heads=H, block_b=8))
for bb in [8, 16]:
    measure(f"attn i8 bb={bb}", lambda x, bb=bb: fused_attention_layer_i8(
        x, ln_s, ln_b, wqkv_q, sqkv, bqkv, wout_q, sout, bout, heads=H, block_b=bb))
measure("mlp bf16 bb=4", lambda x: fused_mlp_layer(
    x, ln_s, ln_b, wfc, bfc, wproj, bproj, block_b=4))
for bb in [8, 16]:
    measure(f"mlp i8 bb={bb}", lambda x, bb=bb: fused_mlp_layer_i8(
        x, ln_s, ln_b, wfc_q, sfc, bfc, wproj_q, sproj, bproj, block_b=bb))
