"""Regenerate the committed four-scenarios sample artifact
(docs/sample_results/four_scenarios_tpu_sample.json) on the real TPU.

Protocol (mirrors the reference's committed artifact,
/root/reference results/comprehensive_defense_evaluation/
four_scenarios_1754481353.json — COCO; the reference used n=50):

- trained tiny-CLIP COCO fixture (tvc/fixtures.py — geometry-regularized
  so hubness is a live attack, see geometry_regularizer), REAL COCO
  val2017 caption text, n=200 (round-4 VERDICT item 6: n=50 made FPR 0.04
  mean '2 of 50'; every rate/AUROC row now carries a 95% bootstrap CI), seven attack rows: pgd / hubness / fgsm / cw /
  fsta / sma plus ``cw_ref`` — one C&W run at the reference's exact
  spec (1000 iterations x 9 binary-search steps,
  src/attacks/cw_attack.py:30-36).
- scenario-3 overhead is reported twice: the staged tiny-fixture
  pipeline number (protocol parity) AND the production serving path
  (ViT-B/32 int8 fused step, B=256, 131k bank —
  four_scenarios.measure_serving_overhead), comparable to the
  reference's measured relative overhead 0.246.

Run from the repo root:  python scripts/regen_four_scenarios.py
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from tvc.experiments.four_scenarios import measure_serving_overhead
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    harness = ExperimentHarness(
        HarnessConfig(
            experiment_mode="four_scenarios",
            attacks=("pgd", "hubness", "fgsm", "cw", "fsta", "sma", "cw_ref"),
            num_samples=200,
        )
    )
    results = harness.run()

    print("measuring serving-path overhead (ViT-B/32 int8, B=256)...")
    serving = measure_serving_overhead()
    for scope in (
        results["scenarios"]["scenario_3"],
        results["scenario_3_defense_no_attack"],
    ):
        scope.update(serving)
    results["summary"]["defense_overhead_serving"] = serving[
        "defense_overhead_serving"
    ]
    results["summary"]["key_metrics"]["defense_overhead_serving"] = serving[
        "defense_overhead_serving"
    ]

    out = Path("docs/sample_results/four_scenarios_tpu_sample.json")
    out.write_text(json.dumps(results, indent=2, default=float))
    src = results.get("output_path")
    if src and Path(src).exists():
        # keep results/ (gitignored) and the committed doc copy in sync
        shutil.copy(out, src)
    print(f"wrote {out}")
    print(json.dumps(results["summary"], indent=2, default=float))


if __name__ == "__main__":
    main()
