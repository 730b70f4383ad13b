"""Regenerate the committed adaptive-attack sample artifact
(docs/sample_results/adaptive_attack_tpu_sample.json) on the real TPU.

One harness adaptive_attack run on the geometry-regularized COCO fixture:
PGD + hubness bases swept over the λ grid (densified around the measured
knee), a STRONG pass at the best-evasion λ (500 steps, EOT over 4 fresh
defender variant draws), and the defense-aware text attack at λ ∈ {0, 1}
(tvc/attacks/adaptive.py; round-4 VERDICT item 5). Detection is scored by
the production pipeline with fresh defender variants.

Run from the repo root:  python scripts/regen_adaptive.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from tvc.experiments.harness import ExperimentHarness, HarnessConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    harness = ExperimentHarness(
        HarnessConfig(
            experiment_mode="adaptive_attack",
            num_samples=n,
            attacks=("pgd", "hubness"),
        )
    )
    results = harness.run_adaptive_attack()
    results["num_samples"] = n

    out = Path("docs/sample_results/adaptive_attack_tpu_sample.json")
    out.write_text(json.dumps(results, indent=2, default=float))
    print(f"wrote {out}")
    for base, r in results["adaptive_attack"].items():
        strong = r.get("strong")
        if strong:
            print(
                f"{base} strong(λ={strong['penalty_weight']}, "
                f"{strong['num_steps']} steps, EOT={strong['eot_samples']}): "
                f"evasion {strong['evasion_success_rate']:.3f} "
                f"band-AUROC {strong['auroc_band']:.3f}"
            )


if __name__ == "__main__":
    main()
