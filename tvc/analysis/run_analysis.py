"""Post-hoc analysis: scan result JSONs -> markdown report + charts +
LaTeX tables + summary index.

Covers reference analysis/ (UnifiedAnalysisRunner run_analysis.py:34-307,
generate_comprehensive_report.py, generate_charts.py,
generate_latex_tables.py).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, float]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[key] = float(v)
    return out


def load_results(results_dir: str) -> List[Dict[str, Any]]:
    """Collect every experiment-result JSON under the directory."""
    out = []
    for p in sorted(Path(results_dir).rglob("*.json")):
        try:
            data = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        if isinstance(data, dict):
            data["_source"] = str(p)
            out.append(data)
    return out


def generate_comprehensive_report(
    results: List[Dict[str, Any]], output_path: str
) -> str:
    """(reference generate_comprehensive_report.py)"""
    lines = ["# Comprehensive experiment report", ""]
    lines.append(f"Generated: {time.strftime('%Y-%m-%d %H:%M:%S')}")
    lines.append(f"Experiments analyzed: {len(results)}")
    lines.append("")
    for res in results:
        name = res.get("experiment") or Path(res["_source"]).stem
        lines.append(f"## {name}")
        lines.append(f"Source: `{res['_source']}`")
        flat = _flatten({k: v for k, v in res.items() if not k.startswith("_")})
        # surface the headline metrics first
        headline = [
            k
            for k in flat
            if any(
                t in k.lower()
                for t in ("auroc", "detection_rate", "success", "accuracy", "f1", "qps", "throughput")
            )
        ]
        for k in sorted(headline):
            lines.append(f"- **{k}**: {flat[k]:.4f}")
        rest = sorted(set(flat) - set(headline))
        if rest:
            lines.append("<details><summary>all metrics</summary>")
            lines.append("")
            for k in rest:
                lines.append(f"- {k}: {flat[k]:.4f}")
            lines.append("</details>")
        lines.append("")
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    Path(output_path).write_text("\n".join(lines))
    return output_path


def generate_charts(results: List[Dict[str, Any]], output_dir: str) -> List[str]:
    """(reference generate_charts.py) — bar charts of headline metrics per
    experiment family."""
    from tvc.utils.visualization import VisualizationManager

    viz = VisualizationManager(output_dir)
    paths = []
    for res in results:
        flat = _flatten({k: v for k, v in res.items() if not k.startswith("_")})
        headline = {
            k.split(".")[-1] + f"_{i}": v
            for i, (k, v) in enumerate(sorted(flat.items()))
            if "auroc" in k.lower() or "detection_rate" in k.lower()
        }
        if headline:
            name = (res.get("experiment") or Path(res["_source"]).stem)[:40]
            paths.append(viz.plot_metric_bars(headline, name=f"chart_{name}"))
    return paths


def generate_latex_tables(results: List[Dict[str, Any]], output_path: str) -> str:
    """(reference generate_latex_tables.py) — one booktabs table of headline
    metrics per experiment."""
    rows = []
    for res in results:
        name = (res.get("experiment") or Path(res["_source"]).stem).replace("_", r"\_")
        flat = _flatten({k: v for k, v in res.items() if not k.startswith("_")})
        auroc = [v for k, v in flat.items() if "auroc" in k.lower()]
        det = [v for k, v in flat.items() if "detection_rate" in k.lower()]
        fpr = [v for k, v in flat.items() if "false_positive" in k.lower()]
        rows.append(
            (
                name,
                f"{max(auroc):.3f}" if auroc else "--",
                f"{max(det):.3f}" if det else "--",
                f"{min(fpr):.3f}" if fpr else "--",
            )
        )
    lines = [
        r"\begin{table}[t]",
        r"\centering",
        r"\caption{Detection results}",
        r"\begin{tabular}{lccc}",
        r"\toprule",
        r"Experiment & AUROC & Detection rate & FPR \\",
        r"\midrule",
    ]
    for name, a, d, f in rows:
        lines.append(rf"{name} & {a} & {d} & {f} \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    Path(output_path).write_text("\n".join(lines))
    return output_path


class UnifiedAnalysisRunner:
    """(reference analysis/run_analysis.py:34-307)"""

    def __init__(self, results_dir: str = "./results", output_dir: Optional[str] = None):
        self.results_dir = results_dir
        self.output_dir = Path(output_dir or (Path(results_dir) / "analysis"))

    def run(self, charts: bool = True) -> Dict[str, Any]:
        results = load_results(self.results_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        report = generate_comprehensive_report(
            results, str(self.output_dir / "comprehensive_report.md")
        )
        latex = generate_latex_tables(
            results, str(self.output_dir / "tables.tex")
        )
        chart_paths = (
            generate_charts(results, str(self.output_dir / "charts")) if charts else []
        )
        index = {
            "generated": time.time(),
            "num_experiments": len(results),
            "report": report,
            "latex": latex,
            "charts": chart_paths,
            "sources": [r["_source"] for r in results],
        }
        (self.output_dir / "index.json").write_text(json.dumps(index, indent=2))
        return index
