"""Generative-stack throughput benchmark: SD image synthesis + Qwen decode.

Covers the reference's dominant-cost path (SD reference generation,
README.md:907 12.4 ms/query amortized on 6x4090) and the Qwen paraphrase
decode. Configurable scale: --tiny (test), --mid (256px SD / 0.5B-shaped
Qwen), --full (512px SD-1.5 shape).

Run: python benchmarks/genref_benchmark.py --tiny
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["tiny", "mid", "full"], default="tiny")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--output", default=None)
    args = p.parse_args()

    import dataclasses

    import jax

    from tvc.models.qwen import QwenConfig, QwenModel
    from tvc.models.sd import SDConfig, StableDiffusionModel

    if args.scale == "tiny":
        sd_cfg = SDConfig.tiny()
        qw_cfg = QwenConfig.tiny()
    elif args.scale == "mid":
        sd_cfg = dataclasses.replace(
            SDConfig(),
            image_size=256,
            unet_base=192,
            context_dim=512,
            num_inference_steps=args.steps,
        )
        qw_cfg = QwenConfig()  # 0.5B shape
    else:
        sd_cfg = dataclasses.replace(SDConfig(), num_inference_steps=args.steps)
        qw_cfg = QwenConfig.qwen2_1_5b()

    results = {"scale": args.scale, "backend": jax.default_backend()}

    # --- SD ---
    sd = StableDiffusionModel(sd_cfg, seed=0)
    prompts = [f"a scene number {i}" for i in range(args.batch)]
    t0 = time.time()
    sd.generate_images_batch(prompts, num_images=1, seed=0)
    results["sd_compile_plus_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    out = sd.generate_images_batch(prompts, num_images=1, seed=1)
    dt = time.time() - t0
    results["sd_images_per_s"] = round(args.batch / dt, 3)
    results["sd_ms_per_image"] = round(dt / args.batch * 1e3, 2)
    results["sd_steps"] = sd_cfg.num_inference_steps
    results["sd_image_size"] = sd_cfg.image_size

    # --- Qwen ---
    qw = QwenModel(qw_cfg, seed=0, max_new_tokens=32, cast_params_bf16=True)
    t0 = time.time()
    qw.generate_paraphrases("a cat sat on a mat near the window", num_paraphrases=args.batch)
    results["qwen_compile_plus_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    outs = qw.generate_paraphrases("a dog runs across the street quickly", num_paraphrases=args.batch)
    dt = time.time() - t0
    results["qwen_paraphrases_per_s"] = round(args.batch / dt, 3)
    results["qwen_tokens_per_s"] = round(args.batch * 32 / dt, 1)

    # int8 weight-only decode (decode is HBM-bandwidth-bound; ~2x)
    qw.quantize_weights_int8()
    qw._decode_fn = None  # recompile against the quantized tree
    t0 = time.time()
    qw.generate_paraphrases("a cat sat on a mat near the window", num_paraphrases=args.batch)
    results["qwen_i8_compile_plus_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    qw.generate_paraphrases("a dog runs across the street quickly", num_paraphrases=args.batch)
    dt = time.time() - t0
    results["qwen_i8_paraphrases_per_s"] = round(args.batch / dt, 3)
    results["qwen_i8_tokens_per_s"] = round(args.batch * 32 / dt, 1)

    text = json.dumps(results, indent=2)
    print(text)
    if args.output:
        Path(args.output).write_text(text)


if __name__ == "__main__":
    main()
