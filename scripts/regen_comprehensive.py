"""Regenerate the committed comprehensive-mode sample artifact
(docs/sample_results/comprehensive_tpu_sample.json) on the real TPU.

One harness run through ALL six experiment modes (four_scenarios /
defense_effectiveness / baseline_comparison / ablation_study /
efficiency_analysis, reference experiments/run_experiments.py's
``comprehensive``), coco-trained fixture, REAL COCO val2017 captions,
n=50, plus the hardware block and the jax.profiler trace dir pointer.

Run from the repo root:  python scripts/regen_comprehensive.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig
    from tvc.utils.hardware import HardwareDetector

    harness = ExperimentHarness(
        HarnessConfig(experiment_mode="comprehensive", num_samples=50)
    )
    results = harness.run()
    results["hardware"] = HardwareDetector().summary()
    results["num_samples"] = 50

    out = Path("docs/sample_results/comprehensive_tpu_sample.json")
    out.write_text(json.dumps(results, indent=2, default=float))
    print(f"wrote {out}")
    km = results["four_scenarios"]["summary"]["key_metrics"]
    print(json.dumps(km, indent=2, default=float))


if __name__ == "__main__":
    main()
