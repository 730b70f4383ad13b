"""End-to-end hubness attack + defense demo.

(reference examples/hubness_attack_demo.py, 331 LoC): build a small
gallery, run the hubness attack so one image becomes top-1 for many
queries, show the hubness score, then show the TVC defense catching it.

Run: python examples/hubness_attack_demo.py [--full-clip]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full-clip", action="store_true", help="use ViT-B/32 (slow compile)")
    p.add_argument("--num-samples", type=int, default=8)
    args = p.parse_args()

    from tvc.attacks import HubnessAttack, HubnessAttackConfig
    from tvc.augment import TextAugmentConfig, TextAugmenter
    from tvc.data import DataConfig, SyntheticDataset
    from tvc.models import CLIPConfig, CLIPModel
    from tvc.pipeline import MultiModalDetectionPipeline, PipelineConfig

    cfg = CLIPConfig() if args.full_clip else CLIPConfig.tiny()
    model = CLIPModel(cfg, seed=0)
    ds = SyntheticDataset(
        DataConfig(image_size=cfg.image_size, max_samples=args.num_samples * 4)
    )
    batch = next(ds.batches(batch_size=args.num_samples * 4))
    gallery_images = batch["images"][args.num_samples :]
    attack_images = batch["images"][: args.num_samples]
    queries = batch["texts"]

    print(f"== hubness attack ({len(attack_images)} images, {len(queries)} query pool)")
    attacker = HubnessAttack(
        model,
        HubnessAttackConfig(num_iterations=100, num_target_queries=16),
    )
    attacker.build_reference_database(images=gallery_images, texts=queries)
    result = attacker.attack(attack_images)
    print(f"   mean query-sim after attack: {result.final_similarity.mean():.3f}")
    print(f"   hubness scores: {np.round(result.info['hubness_scores'], 3)}")
    print(f"   success rate (> {attacker.config.success_threshold}): {result.success_rate:.2f}")

    print("== TVC defense")
    pipe = MultiModalDetectionPipeline(
        model,
        PipelineConfig(batch_size=args.num_samples),
        text_augmenter=TextAugmenter(TextAugmentConfig(seed=0)),
    )
    texts = batch["texts"][: args.num_samples]
    clean = pipe.process_batch(attack_images, texts)
    # calibrate the clean band before judging (an uncalibrated default
    # threshold makes the flag count meaningless): anything outside the
    # clean-score band — too inconsistent (PGD-like) or too consistent
    # (hubness-like) — flags adversarial
    lo, hi = pipe.detector.calibrate_two_sided(clean.scores, quantile=0.9)
    adv = pipe.process_batch(result.adv_images, texts)
    recal = pipe.process_batch(attack_images, texts)
    print(f"   mean clean score: {clean.scores.mean():.3f}")
    print(f"   mean adv score:   {adv.scores.mean():.3f}")
    print(f"   clean band (q=0.9): [{lo:.3f}, {hi:.3f}]")
    print(f"   adversarial flagged: {int(adv.is_adversarial.sum())}/{len(texts)}")
    print(f"   clean false alarms:  {int(recal.is_adversarial.sum())}/{len(texts)}")


if __name__ == "__main__":
    main()
