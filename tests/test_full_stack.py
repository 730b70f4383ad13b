"""Full-stack integration: Qwen-backed variants + SD references + retrieval
bank through the complete pipeline and the comprehensive harness — the
reference's `coco_pgd_full`-shaped run at tiny scale (SURVEY.md §4)."""

import numpy as np
import pytest

from tvc.augment import TextAugmentConfig, TextAugmenter
from tvc.data import DataConfig, SyntheticDataset
from tvc.models import CLIPConfig, CLIPModel, QwenConfig, QwenModel, SDConfig, StableDiffusionModel
from tvc.pipeline import MultiModalDetectionPipeline, PipelineConfig
from tvc.retrieval import MultiModalRetriever, RetrievalConfig
from tvc.sd_ref import SDReferenceConfig, SDReferenceGenerator


@pytest.fixture(scope="module")
def stack():
    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    qwen = QwenModel(QwenConfig.tiny(), seed=0, max_new_tokens=6)
    sd = StableDiffusionModel(SDConfig.tiny(), seed=0)
    sd_gen = SDReferenceGenerator(
        sd, SDReferenceConfig(num_images=2, quality_threshold=0.0), clip_model=clip
    )
    augmenter = TextAugmenter(
        TextAugmentConfig(seed=0),
        paraphrase_generator=qwen.as_paraphrase_generator(),
        clip_model=clip,
    )
    retriever = MultiModalRetriever(clip, RetrievalConfig(top_k=3))
    ds = SyntheticDataset(DataConfig(image_size=clip.config.image_size, max_samples=24))
    all_batches = list(ds.batches(batch_size=24))[0]
    bank_imgs = all_batches["images"][8:]
    retriever.build_image_index(images=bank_imgs, items=list(range(len(bank_imgs))))
    pipe = MultiModalDetectionPipeline(
        clip,
        PipelineConfig(batch_size=8, retrieval_top_k=3, num_reference_images=2),
        text_augmenter=augmenter,
        retriever=retriever,
        sd_generator=sd_gen.as_reference_generator(),
    )
    return clip, pipe, all_batches["images"][:8], all_batches["texts"][:8]


@pytest.mark.slow
def test_full_pipeline_runs_all_components(stack):
    clip, pipe, images, texts = stack
    res = pipe.process_batch(images, texts)
    assert res.is_adversarial.shape == (8,)
    # every method contributed (text variants from qwen+host strategies,
    # references from retrieval bank + SD synthesis)
    assert all(len(v) > 0 for v in res.variants)
    assert res.retrieved is not None
    assert res.method_scores["sd_reference"].shape == (8,)
    assert np.all(np.isfinite(res.scores))


@pytest.mark.slow
def test_full_pipeline_detects_pgd(stack):
    from tvc.attacks import PGDAttackConfig, PGDAttacker

    clip, pipe, images, texts = stack
    adv = PGDAttacker(
        clip, PGDAttackConfig(epsilon=16 / 255, alpha=4 / 255, num_steps=20)
    ).attack(images, list(texts)).adv_images
    clean_scores = pipe.process_batch(images, texts).scores
    adv_scores = pipe.process_batch(adv, texts).scores
    assert adv_scores.mean() > clean_scores.mean()
    from tvc.metrics import DetectionEvaluator

    labels = np.concatenate([np.zeros(8), np.ones(8)])
    auroc = DetectionEvaluator.auroc(labels, np.concatenate([clean_scores, adv_scores]))
    assert auroc > 0.6


@pytest.mark.slow
def test_harness_with_sd_and_qwen(tmp_path):
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    h = ExperimentHarness(
        HarnessConfig(
            experiment_mode="defense_effectiveness",
            num_samples=6,
            attacks=("pgd",),
            clip_model="tiny",
            use_sd=True,
            use_qwen=True,
            output_dir=str(tmp_path),
        )
    )
    out = h.run()
    assert "defense_effectiveness" in out
    assert 0.0 <= out["defense_effectiveness"]["pgd"]["auroc"] <= 1.0
