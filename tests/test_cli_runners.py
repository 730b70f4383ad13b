"""CLI entry points, runners, configs, demo/benchmark scripts."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_attack_runner_sweep():
    from tvc.experiments.harness import HarnessConfig
    from tvc.experiments.runners import AttackRunner

    runner = AttackRunner(HarnessConfig(num_samples=4, clip_model="tiny"))
    out = runner.run(["pgd", "fgsm"])
    assert set(out["attack_sweep"]) == {"pgd", "fgsm"}
    for v in out["attack_sweep"].values():
        assert 0.0 <= v["success_rate"] <= 1.0
        assert v["elapsed_s"] > 0


@pytest.mark.slow
def test_detection_runner_variant():
    from tvc.experiments.harness import HarnessConfig
    from tvc.experiments.runners import DetectionRunner

    runner = DetectionRunner(HarnessConfig(num_samples=6, attacks=("pgd",), clip_model="tiny"))
    out = runner.run("consistency_only")
    assert out["variant"] == "consistency_only"
    assert 0.0 <= out["auroc"] <= 1.0
    with pytest.raises(ValueError):
        runner.run("bogus")


def test_cli_hardware_detect(capsys):
    from tvc.cli import hardware_detect_main

    hardware_detect_main([])
    out = json.loads(capsys.readouterr().out)
    assert out["num_devices"] == 8


def test_cli_config_gen(capsys):
    from tvc.cli import config_gen_main

    config_gen_main(["--no-write"])
    out = json.loads(capsys.readouterr().out)
    assert out["profile"] == "cpu"


def test_cli_deploy_modes(capsys, monkeypatch, tmp_path):
    """mm-deploy flag surface (reference deploy.py modes): detect-only,
    config-only with forced profile, bad-profile error, interactive menu."""
    import pytest

    from tvc.cli import deploy_main
    from tvc.utils import profiles

    # --config-only writes auto_generated_config.yaml; keep the repo's
    # TPU-generated copy out of the blast radius by writing to tmp_path.
    orig_init = profiles.DynamicConfigManager.__init__
    monkeypatch.setattr(
        profiles.DynamicConfigManager,
        "__init__",
        lambda self, config_dir=None: orig_init(self, str(tmp_path)),
    )

    deploy_main(["--detect-only"])
    assert "hardware:" in capsys.readouterr().out

    deploy_main(["--config-only", "--profile", "tpu_pod_slice"])
    assert "profile: tpu_pod_slice" in capsys.readouterr().out

    with pytest.raises(ValueError):
        deploy_main(["--config-only", "--profile", "bogus"])

    answers = iter(["1", "bad", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    deploy_main(["--interactive"])
    out = capsys.readouterr().out
    assert "hardware:" in out and "unknown choice" in out


@pytest.mark.slow
def test_cli_build_bank(tmp_path, capsys):
    from tvc.cli import build_bank_main

    build_bank_main(
        [
            "--dataset", "synthetic", "--max-samples", "32",
            "--output", str(tmp_path / "bank"),
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["image_bank"] == 32
    assert (tmp_path / "bank" / "retriever.json").exists()
    # reload and search
    from tvc.models import CLIPConfig, CLIPModel
    from tvc.retrieval import MultiModalRetriever

    r = MultiModalRetriever(CLIPModel(CLIPConfig.tiny(), seed=0))
    r.load(str(tmp_path / "bank"))
    res = r.retrieve_images_by_text("a dog", top_k=3)
    assert res.indices.shape == (1, 3)


def test_experiment_config_resolution():
    from tvc.config import ConfigLoader, get_by_path

    cfg = ConfigLoader().load("experiments/coco_pgd_full.yaml")
    assert get_by_path(cfg, "attack.type") == "pgd"
    assert get_by_path(cfg, "defense.text_variants.num_variants") == 8
    assert get_by_path(cfg, "batch.default_size") == 256  # override applied
    assert get_by_path(cfg, "data.name") == "coco"
    # second-level inheritance
    cfg2 = ConfigLoader().load("experiments/ablation_consistency_only.yaml")
    assert get_by_path(cfg2, "defense.text_variants.enabled") is False
    assert get_by_path(cfg2, "attack.type") == "pgd"  # inherited through chain


@pytest.mark.slow
def test_hubness_demo_script():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "hubness_attack_demo.py"), "--num-samples", "4"],
        capture_output=True, text=True, timeout=400,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "hubness scores" in proc.stdout
    assert "TVC defense" in proc.stdout


@pytest.mark.slow
def test_hubness_benchmark_script(tmp_path):
    out = tmp_path / "bench.json"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "benchmarks" / "hubness_attack_benchmark.py"),
            "--presets", "fast", "--batch-sizes", "2", "--output", str(out),
        ],
        capture_output=True, text=True, timeout=400,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(REPO)},
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    data = json.loads(out.read_text())
    assert data["runs"][0]["preset"] == "fast"
    assert data["runs"][0]["images_per_s"] > 0
