"""Hubness attack performance/correctness benchmark.

(reference benchmarks/hubness_attack_benchmark.py:36-524: synthetic data,
per-preset wall-time + memory + hubness-score tracking, JSON results.)

Run: python benchmarks/hubness_attack_benchmark.py [--full-clip] [--output F]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def measure_rss_mb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 1e6
    except ImportError:
        return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full-clip", action="store_true")
    p.add_argument("--batch-sizes", nargs="+", type=int, default=[4, 16])
    p.add_argument("--presets", nargs="+", default=["fast", "standard"])
    p.add_argument("--output", default="./results/hubness_benchmark.json")
    args = p.parse_args()

    from tvc.attacks import HubnessAttack, HubnessAttackPresets
    from tvc.data import DataConfig, SyntheticDataset
    from tvc.models import CLIPConfig, CLIPModel
    from tvc.utils.hardware import HardwareDetector

    cfg = CLIPConfig() if args.full_clip else CLIPConfig.tiny()
    model = CLIPModel(cfg, seed=0)
    queries = [f"benchmark query number {i} describing a scene" for i in range(64)]

    results = {"system": HardwareDetector().summary(), "runs": []}
    for preset_name in args.presets:
        preset = getattr(HubnessAttackPresets, preset_name)()
        for bs in args.batch_sizes:
            ds = SyntheticDataset(DataConfig(image_size=cfg.image_size, max_samples=bs))
            images = next(ds.batches(batch_size=bs))["images"]
            attacker = HubnessAttack(model, preset)
            attacker.build_reference_database(images=images, texts=queries)
            rss0 = measure_rss_mb()
            t0 = time.time()
            result = attacker.attack(images)
            elapsed = time.time() - t0
            results["runs"].append(
                {
                    "preset": preset_name,
                    "batch_size": bs,
                    "iterations": preset.num_iterations,
                    "elapsed_s": elapsed,
                    "images_per_s": bs / elapsed,
                    "mean_hubness_score": float(
                        np.mean(result.info["hubness_scores"])
                    )
                    if result.info["hubness_scores"] is not None
                    else None,
                    "mean_query_similarity": float(result.final_similarity.mean()),
                    "rss_delta_mb": measure_rss_mb() - rss0,
                }
            )
            print(json.dumps(results["runs"][-1]))
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(results, indent=2))
    print(f"written: {args.output}")


if __name__ == "__main__":
    main()
