"""Alt defense stack, evaluation subpackage, analysis, utils."""

import json

import numpy as np
import pytest

from tvc.defenses import ConsistencyChecker, DetectionConfig, MultiModalDefenseDetector
from tvc.evaluation import (
    DataValidationConfig,
    DataValidator,
    ExperimentConfig,
    ExperimentEvaluator,
)
from tvc.models import CLIPConfig, CLIPModel


@pytest.fixture(scope="module")
def clip():
    return CLIPModel(CLIPConfig.tiny(), seed=0)


@pytest.fixture(scope="module")
def batch(clip):
    rng = np.random.default_rng(0)
    s = clip.config.image_size
    images = rng.random((6, s, s, 3)).astype(np.float32)
    texts = [f"a scene with object number {i}" for i in range(6)]
    return images, texts


def make_alt_detector(clip, **kw):
    rng = np.random.default_rng(1)
    D = clip.config.embed_dim

    def variants(text, n):
        return [f"variant {i} of {text}" for i in range(n)]

    def refs(texts, n):
        t = np.asarray(clip.encode_text(list(texts)))
        r = t[:, None, :] + 0.1 * rng.normal(size=(len(texts), n, D))
        return r / np.linalg.norm(r, axis=-1, keepdims=True)

    return MultiModalDefenseDetector(
        clip,
        DetectionConfig(**kw),
        text_variant_generator=variants,
        retrieval_generator=refs,
        generative_generator=refs,
    )


@pytest.mark.slow
def test_alt_detector_batched(clip, batch):
    images, texts = batch
    det = make_alt_detector(clip)
    res = det.detect(images, texts)
    assert res["is_adversarial"].shape == (6,)
    assert res["overall_score"].shape == (6,)
    cs = res["consistency_scores"]
    assert set(cs) >= {"original_similarity", "text_variant_consistency", "cross_modal_variance"}


def test_alt_detector_single_and_decision_direction(clip, batch):
    images, texts = batch
    det = make_alt_detector(clip, adaptive_threshold=False, threshold=0.99)
    out = det.detect_single(images[0], texts[0])
    # threshold ~0.99 means almost everything flags adversarial (score < thr)
    assert out["is_adversarial"] is True
    det2 = make_alt_detector(clip, adaptive_threshold=False, threshold=-1.0)
    out2 = det2.detect_single(images[0], texts[0])
    assert out2["is_adversarial"] is False


@pytest.mark.slow
def test_checker_history_and_stats(clip, batch):
    images, texts = batch
    det = make_alt_detector(clip)
    det.detect(images, texts)
    det.detect(images, texts)
    stats = det.get_stats()
    assert stats["detections"] == 12
    assert stats["checker"]["total_decisions"] == 12


def test_checker_calibration():
    checker = ConsistencyChecker(threshold=0.5, adaptive_threshold=False)
    clean = np.asarray([0.8, 0.75, 0.9, 0.85])
    adv = np.asarray([0.2, 0.3, 0.25, 0.15])
    thr = checker.calibrate_threshold(clean, adv)
    assert 0.3 <= thr <= 0.75  # separates the groups


def test_dedup_references(clip):
    det = make_alt_detector(clip, dedup_similarity=0.99)
    refs = np.ones((1, 3, clip.config.embed_dim), np.float32)
    out = det._deduplicate_references(refs)
    # identical rows: only the first survives
    assert np.any(out[0, 0] != 0)
    assert np.all(out[0, 1] == 0) and np.all(out[0, 2] == 0)


# ---- evaluation --------------------------------------------------------------


def test_cross_validation(rng):
    labels = np.concatenate([np.zeros(100), np.ones(100)])
    scores = np.concatenate([rng.normal(0.3, 0.1, 100), rng.normal(0.7, 0.1, 100)])
    ev = ExperimentEvaluator(ExperimentConfig(n_folds=5, n_bootstrap=100))
    res = ev.cross_validate(labels, scores)
    assert res.metrics["auroc"] > 0.9
    assert len(res.fold_metrics) == 5
    lo, mid, hi = res.confidence_intervals["auroc"][1], res.metrics["auroc"], res.confidence_intervals["auroc"][2]
    assert lo <= hi


def test_compare_methods_significance(rng):
    labels = np.concatenate([np.zeros(200), np.ones(200)])
    good = np.concatenate([rng.normal(0.2, 0.1, 200), rng.normal(0.8, 0.1, 200)])
    bad = rng.random(400)
    ev = ExperimentEvaluator(ExperimentConfig(n_folds=8, n_bootstrap=50))
    cmp = ev.compare_methods(labels, good, bad, "good", "bad")
    assert cmp["auroc_delta"] > 0.2
    assert cmp["p_value"] < 0.05 and cmp["significant"]


def test_data_validator_finds_issues(clip):
    rng = np.random.default_rng(2)
    s = clip.config.image_size
    images = rng.random((6, s, s, 3)).astype(np.float32)
    images[3] = images[0]  # exact duplicate
    images[4] = 0.5  # blank
    texts = ["a cat on a mat", "a dog", "x", "a cat on a mat", "blank image here", "fine caption words"]
    v = DataValidator(clip, DataValidationConfig(min_caption_words=2))
    res = v.validate(images, texts)
    assert not res.passed
    assert any(0 in p[:2] and 3 in p[:2] for p in res.near_duplicate_pairs)
    assert 4 in res.low_quality_images
    assert 2 in res.invalid_captions  # "x" too short


def test_data_validator_leakage(clip):
    rng = np.random.default_rng(3)
    s = clip.config.image_size
    train = rng.random((4, s, s, 3)).astype(np.float32)
    eval_imgs = rng.random((3, s, s, 3)).astype(np.float32)
    eval_imgs[1] = train[2]  # leaked
    v = DataValidator(clip)
    res = v.validate(eval_imgs, ["one caption", "two caption", "three caption"], train_images=train)
    assert any(p[0] == 1 and p[1] == 2 for p in res.leakage_pairs)


# ---- analysis ----------------------------------------------------------------


def test_analysis_runner(tmp_path):
    from tvc.analysis import UnifiedAnalysisRunner

    results_dir = tmp_path / "results"
    results_dir.mkdir()
    (results_dir / "exp1.json").write_text(
        json.dumps(
            {
                "experiment": "four_scenarios",
                "scenario_4": {"pgd": {"auroc": 0.97, "detection_rate": 0.9}},
                "summary": {"false_positive_rate": 0.05},
            }
        )
    )
    runner = UnifiedAnalysisRunner(str(results_dir))
    index = runner.run(charts=True)
    assert index["num_experiments"] == 1
    report = open(index["report"]).read()
    assert "auroc" in report and "0.9700" in report
    latex = open(index["latex"]).read()
    assert r"\toprule" in latex and "0.970" in latex


# ---- utils --------------------------------------------------------------------


def test_hardware_detector_and_profiles():
    from tvc.utils import DynamicConfigManager, HardwareDetector, select_profile

    det = HardwareDetector()
    info = det.detect()
    assert info.num_devices == 8  # virtual CPU mesh
    assert info.platform == "cpu"
    profile = select_profile(info)
    assert profile.name == "cpu"
    mgr = DynamicConfigManager()
    cfg = mgr.auto_configure_system(write=False)
    assert cfg["profile"] == "cpu"
    assert cfg["batch"]["default_size"] == profile.batch_size


def test_probe_device_health_cpu():
    """Bounded dispatch+readback liveness probe: healthy on the CPU mesh,
    with a measured first readback and RTT samples (the unhealthy branch
    is exercised live against real tunnel brownouts; its rc=1 CLI
    contract is covered by mm-hardware-detect --probe)."""
    from tvc.utils.hardware import probe_device_health

    h = probe_device_health(timeout_s=60.0, rtt_probes=2)
    assert h["healthy"] is True
    assert h["diagnosis"] == "ok"
    assert h["platform"] == "cpu"
    assert h["first_readback_s"] is not None and h["first_readback_s"] < 60
    assert len(h["rtt_ms"]) == 2


def test_seed_context():
    import random

    from tvc.utils import SeedContext, derive_key, set_random_seed

    set_random_seed(1)
    a = random.random()
    set_random_seed(1)
    assert random.random() == a
    with SeedContext(2):
        b = random.random()
    with SeedContext(2):
        assert random.random() == b
    k1 = derive_key(0, 1, 2)
    k2 = derive_key(0, 1, 2)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_experiment_logger(tmp_path):
    from tvc.utils import ExperimentLogger

    log = ExperimentLogger("unit", output_dir=str(tmp_path), console=False)
    log.start({"param": 1})
    log.log_metrics({"auroc": 0.9}, step=1)
    log.log_artifact("/tmp/x.png")
    log.complete({"final": 1.0})
    rec = json.loads(open(log.record_path()).read())
    assert rec["status"] == "completed"
    assert rec["metrics"]["step_1"]["auroc"] == 0.9
    assert "/tmp/x.png" in rec["artifacts"]


def test_device_monitor():
    import time

    from tvc.utils import DeviceMonitor

    with DeviceMonitor(interval_s=0.05) as mon:
        time.sleep(0.2)
    s = mon.summary()
    assert "samples" in s  # CPU backend may report no memory stats


def test_distribution_shift_detected():
    """A shifted split (brightness offset) must be flagged; an identical
    split must not (reference data_validator.py:30-54 distribution checks)."""
    from tvc.evaluation.data_validator import DataValidator

    rng = np.random.default_rng(0)
    a = rng.random((40, 16, 16, 3)).astype(np.float32)
    same = a + rng.normal(0, 0.002, a.shape).astype(np.float32)
    shifted = np.clip(a * 0.3 + 0.6, 0, 1).astype(np.float32)
    v = DataValidator()
    ok = v.check_distribution_shift(a, same)
    bad = v.check_distribution_shift(a, shifted)
    assert not ok["shifted"], ok
    assert bad["shifted"], bad
    assert bad["frechet_diag"] > ok["frechet_diag"]


def test_cluster_check_finds_outliers():
    from tvc.evaluation.data_validator import DataValidator

    rng = np.random.default_rng(1)
    # two tight clusters + 2 outliers in feature space (no clip model ->
    # features are normalized raw pixels)
    base1 = rng.random((1, 8, 8, 3)).astype(np.float32)
    base2 = rng.random((1, 8, 8, 3)).astype(np.float32)
    cluster = np.concatenate(
        [
            np.clip(base1 + rng.normal(0, 0.01, (10, 8, 8, 3)), 0, 1),
            np.clip(base2 + rng.normal(0, 0.01, (10, 8, 8, 3)), 0, 1),
        ]
    ).astype(np.float32)
    outliers = rng.random((2, 8, 8, 3)).astype(np.float32)
    images = np.concatenate([cluster, outliers])
    out = DataValidator().cluster_check(images)
    assert out["n_clusters"] >= 2
    assert 20 in out["outlier_indices"] or 21 in out["outlier_indices"]


def test_validate_with_reference_and_clusters():
    from tvc.evaluation.data_validator import DataValidator

    rng = np.random.default_rng(2)
    imgs = rng.random((12, 8, 8, 3)).astype(np.float32)
    texts = [f"caption number {i} words" for i in range(12)]
    res = DataValidator().validate(
        imgs, texts, reference_images=imgs.copy(), check_clusters=True
    )
    assert res.distribution_shift is not None
    assert not res.distribution_shift["shifted"]
    assert res.clusters is not None
    assert "n_clusters" in res.summary


def test_evaluator_generate_plots(tmp_path):
    from tvc.evaluation.experiment_evaluator import (
        ExperimentConfig,
        ExperimentEvaluator,
    )

    rng = np.random.default_rng(3)
    labels = np.concatenate([np.zeros(40), np.ones(40)])
    scores = np.concatenate([rng.normal(0.2, 0.1, 40), rng.normal(0.8, 0.1, 40)])
    ev = ExperimentEvaluator(
        ExperimentConfig(generate_plots=True, output_dir=str(tmp_path), n_folds=4)
    )
    res = ev.cross_validate(labels, scores)
    assert len(res.artifacts) == 2
    import os

    assert all(os.path.exists(p) for p in res.artifacts)


def test_analysis_family_aware(tmp_path):
    """Family-aware parsing of a REAL comprehensive-mode artifact: every
    mode becomes its own table; key findings + dashboard are emitted
    (reference analysis/generate_comprehensive_report.py per-family
    parsers, generate_charts.py summary dashboard)."""
    import shutil
    from pathlib import Path

    from tvc.analysis import UnifiedAnalysisRunner
    from tvc.analysis.families import build_table, split_comprehensive

    sample = (
        Path(__file__).resolve().parent.parent
        / "docs" / "sample_results" / "comprehensive_tpu_sample.json"
    )
    results_dir = tmp_path / "results"
    results_dir.mkdir()
    shutil.copy(sample, results_dir / "comprehensive.json")

    body = json.loads(sample.read_text())
    fams = dict(split_comprehensive(body))
    assert "four_scenarios" in fams and "ablation_study" in fams

    # ablation rows carry deltas vs full
    ab = build_table("ablation_study", fams["ablation_study"])
    deltas = [r for r in ab if "auroc_delta_vs_full" in r]
    assert deltas and all(isinstance(r["auroc_delta_vs_full"], float) for r in deltas)

    # efficiency rows carry share-of-total
    eff = build_table("efficiency_analysis", fams["efficiency_analysis"])
    shares = [r["share_of_total"] for r in eff if "share_of_total" in r]
    # components are timed in ISOLATION while end_to_end overlaps
    # stages (and shares ride single-core timing noise), so a share
    # can legitimately exceed 1 — assert finite/positive sanity only
    assert shares and all(0 <= s <= 5.0 for s in shares)

    index = UnifiedAnalysisRunner(str(results_dir)).run(charts=True)
    assert "four_scenarios" in index["families"]
    assert index["key_findings"]
    report = open(index["report"]).read()
    assert "## four_scenarios" in report and "| attack |" in report
    latex = open(index["latex"]).read()
    assert r"\documentclass" in latex and r"\toprule" in latex
    assert any("summary_dashboard" in p for p in index["charts"])
