"""Defended-retrieval serving demo: the full production path.

  dataset -> threaded prefetch -> native C++ preprocess -> CLIP encode ->
  bank top-k -> fused consistency kernel -> accept/reject decisions

Run: python examples/serving_demo.py [--full-clip] [--batches 4]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full-clip", action="store_true")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    import dataclasses

    from tvc import native
    from tvc.augment import TextAugmentConfig, TextAugmenter
    from tvc.data import DataConfig, SyntheticDataset
    from tvc.models import CLIPConfig, CLIPModel
    from tvc.pipeline import MultiModalDetectionPipeline, PipelineConfig
    from tvc.retrieval import MultiModalRetriever, RetrievalConfig

    cfg = (
        # production serving precision: fused int8 W8A8 towers (bench.py
        # headline path; --bf16 there reverts)
        dataclasses.replace(CLIPConfig(), fused_attention=True, int8_serving=True)
        if args.full_clip
        else CLIPConfig.tiny()
    )
    model = CLIPModel(cfg, seed=0)
    print(f"model: {cfg.model_name} | native preprocess: {native.available()}")

    # offline: build the retrieval bank (tvc-build-bank does this for real data)
    n_bank = args.batch_size * 8
    ds = SyntheticDataset(
        DataConfig(image_size=cfg.image_size, max_samples=n_bank + args.batches * args.batch_size)
    )
    bank_batch = next(ds.batches(batch_size=n_bank))
    retriever = MultiModalRetriever(model, RetrievalConfig(top_k=5))
    retriever.build_image_index(images=bank_batch["images"], items=bank_batch["ids"])
    print(f"bank: {retriever.image_bank.size} images")

    pipe = MultiModalDetectionPipeline(
        model,
        PipelineConfig(batch_size=args.batch_size),
        text_augmenter=TextAugmenter(TextAugmentConfig(seed=0)),
        retriever=retriever,
    )

    # calibrate on one clean batch (threshold + clean band)
    calib = next(ds.batches(batch_size=args.batch_size))
    clean_scores = pipe.process_batch(calib["images"], calib["texts"]).scores
    lo, hi = pipe.detector.calibrate_two_sided(clean_scores, quantile=0.98)
    print(f"calibrated clean band: [{lo:.3f}, {hi:.3f}]")

    # online: serve prefetched query batches through the double-buffered
    # streaming loop — variant generation for batch i+1 overlaps the
    # fused detection program for batch i (pipeline.process_stream)
    def _batches():
        for i, batch in enumerate(ds.prefetch_batches(batch_size=args.batch_size)):
            if i >= args.batches:
                break
            yield batch["images"], batch["texts"]

    t0 = time.time()
    results = pipe.process_stream(_batches())
    elapsed = time.time() - t0
    served = sum(len(r.scores) for r in results)
    flagged = sum(int(r.is_adversarial.sum()) for r in results)
    print(
        f"served {served} queries in {elapsed:.2f}s "
        f"({served / elapsed:.1f} q/s end-to-end incl. host pipeline, "
        f"double-buffered), {flagged} flagged adversarial"
    )


if __name__ == "__main__":
    main()
