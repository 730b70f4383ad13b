"""Four-scenarios harness end-to-end on tiny CLIP + synthetic data."""

import numpy as np
import pytest

from tvc.attacks import HubnessAttackConfig, PGDAttackConfig
from tvc.augment import TextAugmentConfig, TextAugmenter
from tvc.data import DataConfig, SyntheticDataset
from tvc.experiments import FourScenariosConfig, FourScenariosExperiment
from tvc.models import CLIPConfig, CLIPModel
from tvc.pipeline import MultiModalDetectionPipeline, PipelineConfig


@pytest.fixture(scope="module")
def setup():
    clip = CLIPModel(CLIPConfig.tiny(), seed=0)
    ds = SyntheticDataset(DataConfig(image_size=clip.config.image_size, max_samples=8))
    batch = next(ds.batches(batch_size=8))
    pipe = MultiModalDetectionPipeline(
        clip,
        PipelineConfig(batch_size=8),
        text_augmenter=TextAugmenter(TextAugmentConfig(seed=0)),
    )
    return clip, pipe, batch


@pytest.mark.slow
def test_four_scenarios_runs_and_separates(setup, tmp_path):
    clip, pipe, batch = setup
    cfg = FourScenariosConfig(
        attacks=("pgd",),
        num_samples=8,
        pgd=PGDAttackConfig(epsilon=16 / 255, alpha=4 / 255, num_steps=15),
        output_dir=str(tmp_path),
    )
    exp = FourScenariosExperiment(clip, pipe, cfg)
    results = exp.run(batch["images"], batch["texts"])

    assert results["num_samples"] == 8
    s1 = results["scenario_1_no_defense_with_attack"]["pgd"]
    s2 = results["scenario_2_no_defense_no_attack"]
    s4 = results["scenario_4_defense_with_attack"]["pgd"]
    # attack lowers similarity vs clean
    assert 0.0 <= s1["attack_success_rate"] <= 1.0
    assert 0.0 <= s2["retrieval_accuracy"] <= 1.0
    # defense separates attacked from clean
    assert s4["auroc"] > 0.5
    # result JSON written
    assert "output_path" in results
    import json

    loaded = json.loads(open(results["output_path"]).read())
    assert loaded["summary"]["auroc"]["pgd"] == s4["auroc"]


@pytest.mark.slow
def test_four_scenarios_hubness(setup, tmp_path):
    clip, pipe, batch = setup
    # disjoint query pool (paper protocol): headline ASR = mean hubness
    # score over the pool, plus the comparability columns
    pool = tuple(f"an unrelated photo of object number {i}" for i in range(6))
    cfg = FourScenariosConfig(
        attacks=("hubness",),
        num_samples=4,
        hubness=HubnessAttackConfig(num_iterations=10, num_target_queries=6),
        hubness_query_pool=pool,
        output_dir=str(tmp_path),
        save_results=False,
    )
    results = FourScenariosExperiment(clip, pipe, cfg).run(batch["images"], batch["texts"])
    row = results["scenario_1_no_defense_with_attack"]["hubness"]
    assert row["attack_success_rate"] == pytest.approx(row["mean_hubness_score"])
    assert 0.0 <= row["samples_above_paper_threshold"] <= 1.0
    assert row["asr_reference_degenerate_criterion"] == 1.0
    assert row["clean_hub_base_rate"] == pytest.approx(1 / 4)


def test_unknown_attack_raises(setup):
    clip, pipe, _ = setup
    exp = FourScenariosExperiment(clip, pipe, FourScenariosConfig(attacks=("bad",), save_results=False))
    with pytest.raises(ValueError):
        exp._make_attacker("bad")


@pytest.mark.slow
def test_retrieval_quality_mode(tmp_path):
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    h = ExperimentHarness(
        HarnessConfig(
            experiment_mode="retrieval_quality",
            num_samples=8,
            clip_model="tiny",
            bank_size=64,
            output_dir=str(tmp_path),
        )
    )
    out = h.run()
    rq = out["retrieval_quality"]
    assert "clean" in rq and "text_attacked" in rq
    # paired image should rank reasonably for its own caption with a tiny
    # random model this is weak, but R@50 over 64 items must be high
    assert rq["clean"]["recall_at_k"]["50"] >= 0.5
    assert 0.0 <= rq["clean"]["MRR"] <= 1.0


def test_harness_hubness_pool_disjoint(tmp_path):
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    h = ExperimentHarness(
        HarnessConfig(
            experiment_mode="four_scenarios",
            num_samples=8,
            clip_model="tiny",
            bank_size=16,
            output_dir=str(tmp_path),
        )
    )
    pool = h._hubness_query_pool()
    assert pool, "expected a non-empty disjoint query pool"
    assert not set(pool) & set(h.texts)
    assert len(pool) <= 100
    fs = h._fs_config(save=False)
    assert tuple(pool) == tuple(fs.hubness_query_pool)
    assert fs.hubness.num_target_queries == len(pool)


@pytest.mark.slow
def test_four_scenarios_reference_schema(setup, tmp_path):
    """Output layout matches the reference's committed artifact
    (results/comprehensive_defense_evaluation/four_scenarios_*.json)."""
    clip, pipe, batch = setup
    cfg = FourScenariosConfig(
        attacks=("pgd",),
        num_samples=4,
        pgd=PGDAttackConfig(num_steps=3),
        output_dir=str(tmp_path),
        save_results=False,
    )
    res = FourScenariosExperiment(clip, pipe, cfg).run(batch["images"], batch["texts"])
    # reference top-level keys
    for key in ("experiment_name", "timestamp", "data_size", "scenarios",
                "metadata", "summary"):
        assert key in res, key
    scen = res["scenarios"]
    for i in range(1, 5):
        s = scen[f"scenario_{i}"]
        assert "scenario_name" in s and "description" in s
    assert "attack_success_rates" in scen["scenario_1"]
    assert "retrieval_accuracy" in scen["scenario_2"]
    assert "defense_overhead" in scen["scenario_3"]
    assert "detection_rates" in scen["scenario_4"]
    assert "key_metrics" in res["summary"]
    assert "experiment_overview" in res["summary"]
    assert res["metadata"]["actual_data_size"] == 4


@pytest.mark.slow
def test_cross_dataset_mode(tmp_path):
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    h = ExperimentHarness(
        HarnessConfig(
            experiment_mode="cross_dataset",
            num_samples=8,
            attacks=("pgd",),
            clip_model="tiny",
            output_dir=str(tmp_path),
        )
    )
    out = h.run()
    cd = out["cross_dataset"]
    assert cd["source"] == "coco_captions" and cd["target"] == "coco_captions"
    assert 0.0 <= cd["auroc"] <= 1.0
    assert 0.0 <= cd["detection_rate"] <= 1.0


@pytest.mark.slow
def test_four_scenarios_kill_and_resume(setup, tmp_path, monkeypatch):
    """Round-3 VERDICT item 10: a killed four-scenarios run resumes from
    stage checkpoints (skipping completed attack generations) and produces
    the same artifact as an uninterrupted run. This implements the fault
    tolerance the reference only declares in YAML
    (configs/experiments/coco_pgd_full.yaml:198-214)."""
    clip, _, batch = setup
    images, texts = batch["images"], batch["texts"]

    def make_exp(ckpt_dir):
        # fresh pipeline per run: augmenter RNG state must start identical
        pipe = MultiModalDetectionPipeline(
            clip,
            PipelineConfig(batch_size=8),
            text_augmenter=TextAugmenter(TextAugmentConfig(seed=0)),
        )
        cfg = FourScenariosConfig(
            attacks=("pgd", "fgsm"),
            num_samples=8,
            pgd=PGDAttackConfig(epsilon=16 / 255, alpha=4 / 255, num_steps=10),
            attack_overrides={"fgsm": {"epsilon": 16 / 255}},
            sweep_epsilons=(8 / 255,),
            save_results=False,
            checkpoint_dir=str(ckpt_dir),
            resume=True,
        )
        return FourScenariosExperiment(clip, pipe, cfg)

    # 1) uninterrupted reference run (its own checkpoint dir)
    ref = make_exp(tmp_path / "ref").run(images, texts)

    # 2) killed run: dies while generating the SECOND attack
    calls = []
    orig = FourScenariosExperiment.generate_adversarial

    def dying(self, images, texts, attack):
        calls.append(attack)
        if len(calls) >= 2:
            raise KeyboardInterrupt("simulated kill")
        return orig(self, images, texts, attack)

    monkeypatch.setattr(FourScenariosExperiment, "generate_adversarial", dying)
    with pytest.raises(KeyboardInterrupt):
        make_exp(tmp_path / "run").run(images, texts)
    assert calls == ["pgd", "fgsm"]
    monkeypatch.setattr(FourScenariosExperiment, "generate_adversarial", orig)

    # 3) resumed run: pgd must come from its snapshot, fgsm regenerates
    calls2 = []

    def counting(self, images, texts, attack):
        calls2.append(attack)
        return orig(self, images, texts, attack)

    monkeypatch.setattr(FourScenariosExperiment, "generate_adversarial", counting)
    res = make_exp(tmp_path / "run").run(images, texts)
    # pgd resumed from checkpoint; fgsm + the sweep row regenerate
    assert "pgd" not in [c for c in calls2[:1]]
    assert calls2[0] == "fgsm"

    # 4) identical artifact (timing/timestamp fields excluded)
    def strip(d):
        import copy

        d = copy.deepcopy(d)
        d.pop("timestamp", None)
        d.pop("total_time", None)
        d.pop("output_path", None)
        d["scenario_2_no_defense_no_attack"].pop("baseline_time", None)
        d["scenarios"]["scenario_2"].pop("baseline_time", None)
        for s3 in (d["scenario_3_defense_no_attack"], d["scenarios"]["scenario_3"]):
            s3.pop("defense_time", None)
            s3.pop("defense_overhead", None)
        return d

    a, b = strip(ref), strip(res)
    np.testing.assert_equal(a["scenario_1_no_defense_with_attack"],
                            b["scenario_1_no_defense_with_attack"])
    np.testing.assert_equal(a["scenario_4_defense_with_attack"],
                            b["scenario_4_defense_with_attack"])
    np.testing.assert_equal(a["epsilon_sweep"], b["epsilon_sweep"])
    assert a["summary"]["key_metrics"]["auroc"] == b["summary"]["key_metrics"]["auroc"]
