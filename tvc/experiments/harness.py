"""Experiment harness: the ``run_experiments.py`` parity CLI.

Covers reference experiments/run_experiments.py (3987 LoC): modes
four_scenarios / defense_effectiveness / baseline_comparison /
ablation_study / efficiency_analysis / comprehensive (:180), dataset
loading (:283), adversarial-sample generation (:357), baseline factory
(:2222: no_defense / unimodal_anomaly_detection / random_text_variants /
retrieval_reference_only / generative_reference_only), ablation grid
(:2628), efficiency analyzers (:3005-3358), JSON+markdown reports
(:1160-1166).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from tvc.augment import TextAugmentConfig, TextAugmenter
from tvc.config import ConfigLoader
from tvc.data import DataConfig, DataLoaderManager
from tvc.experiments.four_scenarios import FourScenariosConfig, FourScenariosExperiment
from tvc.metrics import DetectionEvaluator
from tvc.models import CLIPConfig, CLIPModel
from tvc.pipeline import MultiModalDetectionPipeline, PipelineConfig
from tvc.retrieval import MultiModalRetriever, RetrievalConfig
from tvc.utils.logger import ExperimentLogger

BASELINE_METHODS = (
    "no_defense",
    "unimodal_anomaly_detection",
    "random_text_variants",
    "retrieval_reference_only",
    "generative_reference_only",
)

#: ablation grid (reference run_experiments.py:2628+ and
#: configs/experiments/ablation_*.yaml)
ABLATION_VARIANTS: Dict[str, Dict[str, bool]] = {
    "full": {"text_variants": True, "retrieval": True, "generative": True},
    "no_text_variants": {"text_variants": False, "retrieval": True, "generative": True},
    "no_retrieval_ref": {"text_variants": True, "retrieval": False, "generative": True},
    "no_generative_ref": {"text_variants": True, "retrieval": True, "generative": False},
    "consistency_only": {"text_variants": False, "retrieval": False, "generative": False},
}


class RandomVariantAugmenter:
    """random_text_variants baseline: word-shuffle variants
    (reference :2290-2300)."""

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)

    def generate_variants(self, text: str, n: int = 5) -> List[str]:
        words = text.split()
        out = []
        for _ in range(n):
            w = list(words)
            self._rng.shuffle(w)
            out.append(" ".join(w))
        return out

    def batch_generate_variants(self, texts, n: int = 5):
        return [self.generate_variants(t, n) for t in texts]


@dataclasses.dataclass
class HarnessConfig:
    experiment_mode: str = "four_scenarios"
    dataset: str = "synthetic"
    data_dir: str = "./data"
    num_samples: int = 50
    batch_size: int = 64
    attacks: Sequence[str] = ("pgd", "hubness")
    clip_model: str = "tiny"  # tiny | ViT-B/32
    use_sd: bool = False
    use_qwen: bool = False
    bank_size: int = 4096
    output_dir: str = "./results"
    seed: int = 42
    config_path: Optional[str] = None


class ExperimentHarness:
    """Builds the model/pipeline stack from config and runs the modes."""

    def __init__(self, config: HarnessConfig):
        self.config = config
        cfg = config
        clip_cfg = CLIPConfig.tiny() if cfg.clip_model == "tiny" else CLIPConfig()
        self.model = CLIPModel(clip_cfg, seed=cfg.seed)
        self.logger = ExperimentLogger(
            f"{cfg.experiment_mode}_{cfg.dataset}",
            output_dir=str(Path(cfg.output_dir) / "logs"),
        )
        # data
        mgr = DataLoaderManager(
            DataConfig(
                dataset=cfg.dataset,
                data_dir=cfg.data_dir,
                image_size=clip_cfg.image_size,
                max_samples=cfg.num_samples,
                batch_size=cfg.batch_size,
                seed=cfg.seed,
            )
        )
        self.dataset = mgr.load_dataset()
        batch = next(self.dataset.batches(batch_size=cfg.num_samples))
        self.images = batch["images"]
        self.texts = batch["texts"]
        # retrieval bank (random embeddings stand in for a prebuilt index
        # when no real index is on disk; build_bank.py creates real ones)
        self.retriever = MultiModalRetriever(self.model, RetrievalConfig(top_k=5))
        rng = np.random.default_rng(cfg.seed)
        self.retriever.build_image_index(
            embeddings=rng.normal(size=(cfg.bank_size, clip_cfg.embed_dim)).astype(
                np.float32
            )
        )
        self.sd_generator = None
        if cfg.use_sd:
            from tvc.models.sd import SDConfig, StableDiffusionModel
            from tvc.sd_ref import SDReferenceConfig, SDReferenceGenerator

            sd = StableDiffusionModel(
                SDConfig.tiny() if cfg.clip_model == "tiny" else None, seed=cfg.seed
            )
            self.sd_generator = SDReferenceGenerator(
                sd, SDReferenceConfig(num_images=2), clip_model=self.model
            ).as_reference_generator()
        paraphrase = None
        if cfg.use_qwen:
            from tvc.models.qwen import QwenConfig, QwenModel

            qwen = QwenModel(QwenConfig.tiny(), seed=cfg.seed, max_new_tokens=16)
            paraphrase = qwen.as_paraphrase_generator()
        self.text_augmenter = TextAugmenter(
            TextAugmentConfig(seed=cfg.seed), paraphrase_generator=paraphrase
        )

    # -- pipeline factories -------------------------------------------------------
    def make_pipeline(
        self,
        text_variants: bool = True,
        retrieval: bool = True,
        generative: bool = True,
        random_variants: bool = False,
    ) -> MultiModalDetectionPipeline:
        steps = ["detection"]
        if text_variants:
            steps.insert(0, "text_augment")
        if retrieval:
            steps.insert(-1, "retrieval")
        augmenter = self.text_augmenter
        if random_variants:
            augmenter = RandomVariantAugmenter(seed=self.config.seed)
        pipe = MultiModalDetectionPipeline(
            self.model,
            PipelineConfig(steps=tuple(steps), batch_size=self.config.batch_size),
            text_augmenter=augmenter if text_variants else TextAugmenter(
                TextAugmentConfig(
                    enable_synonym_replacement=False,
                    enable_syntax_transformation=False,
                    enable_template=False,
                    enable_paraphrase_generation=False,
                )
            ),
            retriever=self.retriever if retrieval else None,
            sd_generator=self.sd_generator if generative else None,
        )
        if not text_variants:
            # detector falls back to sd_reference+consistency only
            pipe.detector.config = dataclasses.replace(
                pipe.detector.config,
                methods=tuple(
                    m
                    for m in pipe.detector.config.methods
                    if m != "text_variants"
                ),
            )
        if not (retrieval or generative):
            pipe.detector.config = dataclasses.replace(
                pipe.detector.config,
                methods=tuple(
                    m
                    for m in pipe.detector.config.methods
                    if m != "sd_reference"
                ),
            )
        return pipe

    def _adv_images(self, attack: str = "pgd") -> np.ndarray:
        exp = FourScenariosExperiment(
            self.model, self.make_pipeline(), self._fs_config(save=False)
        )
        return exp.generate_adversarial(self.images, self.texts, attack)

    def _fs_config(self, save: bool = True) -> FourScenariosConfig:
        from tvc.attacks import HubnessAttackConfig, PGDAttackConfig

        fast = self.config.clip_model == "tiny"
        return FourScenariosConfig(
            attacks=tuple(self.config.attacks),
            num_samples=self.config.num_samples,
            pgd=PGDAttackConfig(num_steps=10),
            hubness=HubnessAttackConfig(
                num_iterations=50 if fast else 500,
                num_target_queries=min(16, self.config.num_samples),
            ),
            output_dir=str(Path(self.config.output_dir) / "four_scenarios"),
            save_results=save,
        )

    # -- modes --------------------------------------------------------------------
    def run_four_scenarios(self) -> Dict[str, Any]:
        exp = FourScenariosExperiment(
            self.model, self.make_pipeline(), self._fs_config()
        )
        return exp.run(self.images, self.texts)

    def run_defense_effectiveness(self) -> Dict[str, Any]:
        """Detection metrics per attack (reference :1700-2200)."""
        pipe = self.make_pipeline()
        out = {}
        clean_scores = pipe.process_batch(self.images, self.texts).scores
        for attack in self.config.attacks:
            adv = self._adv_images(attack)
            adv_scores = pipe.process_batch(adv, self.texts).scores
            labels = np.concatenate(
                [np.zeros(len(clean_scores)), np.ones(len(adv_scores))]
            )
            scores = np.concatenate([clean_scores, adv_scores])
            m = DetectionEvaluator.evaluate(labels, scores)
            out[attack] = {
                "auroc": m.auroc,
                "accuracy": m.accuracy,
                "f1": m.f1,
                "fpr_at_95_tpr": m.fpr_at_95_tpr,
                "optimal_threshold": m.optimal_threshold,
            }
        return {"defense_effectiveness": out}

    def run_baseline_comparison(self) -> Dict[str, Any]:
        """(reference :2222-2628)"""
        adv = self._adv_images(self.config.attacks[0])
        results = {}
        for method in BASELINE_METHODS:
            if method == "no_defense":
                # score = 1 - cos(img, text): the raw consistency signal only
                ifeat = np.asarray(self.model.encode_image(self.images))
                afeat = np.asarray(self.model.encode_image(adv))
                tfeat = np.asarray(self.model.encode_text(list(self.texts)))
                clean_s = 1.0 - np.sum(ifeat * tfeat, -1)
                adv_s = 1.0 - np.sum(afeat * tfeat, -1)
                detection_enabled = False
            else:
                pipe = self.make_pipeline(
                    text_variants=method in ("random_text_variants", "retrieval_reference_only", "generative_reference_only"),
                    retrieval=method == "retrieval_reference_only",
                    generative=method == "generative_reference_only",
                    random_variants=method == "random_text_variants",
                )
                clean_s = pipe.process_batch(self.images, self.texts).scores
                adv_s = pipe.process_batch(adv, self.texts).scores
                detection_enabled = True
            labels = np.concatenate([np.zeros(len(clean_s)), np.ones(len(adv_s))])
            scores = np.concatenate([clean_s, adv_s])
            m = DetectionEvaluator.evaluate(labels, scores)
            results[method] = {
                "auroc": m.auroc,
                "f1": m.f1,
                "accuracy": m.accuracy,
                "detection_enabled": detection_enabled,
            }
        # our full method
        full = self.run_defense_effectiveness()["defense_effectiveness"]
        results["tvc_full"] = full[self.config.attacks[0]]
        return {"baseline_comparison": results}

    def run_ablation_study(self) -> Dict[str, Any]:
        """(reference runners/run_ablation.py:205-390)"""
        adv = self._adv_images(self.config.attacks[0])
        results = {}
        for name, flags in ABLATION_VARIANTS.items():
            pipe = self.make_pipeline(
                text_variants=flags["text_variants"],
                retrieval=flags["retrieval"],
                generative=flags["generative"],
            )
            t0 = time.time()
            clean_s = pipe.process_batch(self.images, self.texts).scores
            adv_s = pipe.process_batch(adv, self.texts).scores
            elapsed = time.time() - t0
            labels = np.concatenate([np.zeros(len(clean_s)), np.ones(len(adv_s))])
            m = DetectionEvaluator.evaluate(labels, np.concatenate([clean_s, adv_s]))
            results[name] = {
                "auroc": m.auroc,
                "f1": m.f1,
                "throughput_qps": 2 * len(self.texts) / elapsed,
                "components": flags,
            }
        return {"ablation_study": results}

    def run_efficiency_analysis(self) -> Dict[str, Any]:
        """Per-module timing (reference :3005-3358)."""
        pipe = self.make_pipeline()
        timings: Dict[str, List[float]] = {}
        repeat = 3
        for _ in range(repeat):
            t0 = time.time()
            self.text_augmenter.batch_generate_variants(list(self.texts), 5)
            timings.setdefault("text_augment", []).append(time.time() - t0)
            t0 = time.time()
            np.asarray(self.model.encode_image(self.images))
            timings.setdefault("image_encode", []).append(time.time() - t0)
            t0 = time.time()
            self.retriever.retrieve_images_by_text(list(self.texts))
            timings.setdefault("retrieval", []).append(time.time() - t0)
            t0 = time.time()
            pipe.detector.detect_batch(self.images, self.texts)
            timings.setdefault("detection", []).append(time.time() - t0)
            t0 = time.time()
            pipe.process_batch(self.images, self.texts)
            timings.setdefault("end_to_end", []).append(time.time() - t0)
        n = len(self.texts)
        out = {
            k: {
                "mean_s": float(np.mean(v)),
                "per_query_ms": float(np.mean(v) / n * 1e3),
            }
            for k, v in timings.items()
        }
        from tvc.utils.hardware import HardwareDetector

        return {
            "efficiency_analysis": out,
            "hardware": HardwareDetector().summary(),
            "num_samples": n,
        }

    def run_retrieval_quality(self) -> Dict[str, Any]:
        """Text->image retrieval quality over a paired bank: R@K / NDCG /
        mAP / MRR (reference RetrievalEvaluator usage, metrics.py:379-448),
        clean vs attacked queries."""
        # bank = the eval images themselves + distractors; relevant item for
        # query i is image i
        clip_cfg = self.model.config
        distractors = np.random.default_rng(self.config.seed + 1).normal(
            size=(max(self.config.bank_size - len(self.texts), 0), clip_cfg.embed_dim)
        ).astype(np.float32)
        img_emb = np.asarray(self.model.encode_image(self.images))
        bank = np.concatenate([img_emb, distractors])
        retriever = MultiModalRetriever(self.model, RetrievalConfig(top_k=50))
        retriever.build_image_index(embeddings=bank)

        from tvc.metrics import RetrievalEvaluator

        def eval_queries(texts):
            sims = retriever.compute_similarity_matrix(list(texts))
            ranked = np.argsort(-sims, axis=1)
            relevant = [{i} for i in range(len(texts))]
            m = RetrievalEvaluator.evaluate_from_ranks(ranked, relevant)
            return {
                "recall_at_k": {str(k): v for k, v in m.recall_at_k.items()},
                "ndcg_at_k": {str(k): v for k, v in m.ndcg_at_k.items()},
                "mAP": m.mean_average_precision,
                "MRR": m.mean_reciprocal_rank,
            }

        out = {"clean": eval_queries(self.texts)}
        # attacked images perturb the *image* side; attacked-text queries
        # come from the text attack
        from tvc.attacks import TextAttackConfig, TextAttacker

        adv_texts = TextAttacker(
            self.model, TextAttackConfig(min_text_similarity=0.0)
        ).attack(list(self.images), list(self.texts)).adv_texts
        out["text_attacked"] = eval_queries(adv_texts)
        return {"retrieval_quality": out}

    def run_cross_dataset(self, target_dataset: Optional[str] = None) -> Dict[str, Any]:
        """Cross-dataset generalization (reference README.md:884: AUC-ROC
        calibrated on COCO, evaluated on Flickr30K): calibrate the detector
        threshold on THIS dataset's clean/adv split, then measure detection
        on a different dataset without re-calibration."""
        pipe = self.make_pipeline()
        attack = self.config.attacks[0]

        # calibrate on the source dataset
        adv_src = self._adv_images(attack)
        clean_src = pipe.process_batch(self.images, list(self.texts)).scores
        adv_src_scores = pipe.process_batch(adv_src, list(self.texts)).scores
        thr = pipe.detector.compute_optimal_threshold(clean_src, adv_src_scores)

        # target dataset (default: a disjoint synthetic split; real datasets
        # by name when on disk)
        tgt_name = target_dataset or (
            "synthetic" if self.config.dataset == "synthetic" else self.config.dataset
        )
        mgr = DataLoaderManager(
            DataConfig(
                dataset=tgt_name,
                data_dir=self.config.data_dir,
                image_size=self.model.config.image_size,
                max_samples=self.config.num_samples,
                seed=self.config.seed + 1234,  # disjoint split
            )
        )
        tgt = mgr.load_dataset()
        tbatch = next(tgt.batches(batch_size=self.config.num_samples))
        t_images, t_texts = tbatch["images"], tbatch["texts"]
        exp = FourScenariosExperiment(self.model, pipe, self._fs_config(save=False))
        t_adv = exp.generate_adversarial(t_images, t_texts, attack)

        clean_t = pipe.process_batch(t_images, list(t_texts))
        adv_t = pipe.process_batch(t_adv, list(t_texts))
        labels = np.concatenate([np.zeros(len(t_texts)), np.ones(len(t_texts))])
        scores = np.concatenate([clean_t.scores, adv_t.scores])
        auroc = DetectionEvaluator.auroc(labels, scores)
        return {
            "cross_dataset": {
                "source": self.config.dataset,
                "target": tgt_name,
                "calibrated_threshold": float(thr),
                "auroc": float(auroc),
                "detection_rate": float(adv_t.is_adversarial.mean()),
                "false_positive_rate": float(clean_t.is_adversarial.mean()),
            }
        }

    def run_comprehensive(self) -> Dict[str, Any]:
        out = {}
        out.update({"four_scenarios": self.run_four_scenarios()})
        out.update(self.run_defense_effectiveness())
        out.update(self.run_baseline_comparison())
        out.update(self.run_ablation_study())
        out.update(self.run_efficiency_analysis())
        return out

    # -- driver --------------------------------------------------------------------
    MODES = {
        "four_scenarios": run_four_scenarios,
        "defense_effectiveness": run_defense_effectiveness,
        "baseline_comparison": run_baseline_comparison,
        "ablation_study": run_ablation_study,
        "efficiency_analysis": run_efficiency_analysis,
        "retrieval_quality": run_retrieval_quality,
        "cross_dataset": run_cross_dataset,
        "comprehensive": run_comprehensive,
    }

    def run(self) -> Dict[str, Any]:
        mode = self.config.experiment_mode
        if mode not in self.MODES:
            raise ValueError(f"unknown mode {mode!r}; one of {sorted(self.MODES)}")
        self.logger.start(dataclasses.asdict(self.config))
        try:
            results = self.MODES[mode](self)
        except Exception as e:
            self.logger.fail(str(e))
            raise
        out_dir = Path(self.config.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"{mode}_{int(time.time())}.json"
        path.write_text(json.dumps(results, indent=2, default=float))
        self.write_markdown_report(results, path.with_suffix(".md"))
        self.logger.log_artifact(str(path))
        self.logger.complete()
        results["output_path"] = str(path)
        return results

    def write_markdown_report(self, results: Dict[str, Any], path: Path) -> None:
        """(reference :1649+ markdown report writers)"""
        lines = [f"# {self.config.experiment_mode} report", ""]
        lines.append(f"- dataset: {self.config.dataset} (n={self.config.num_samples})")
        lines.append(f"- model: {self.config.clip_model}")
        lines.append(f"- attacks: {', '.join(self.config.attacks)}")
        lines.append("")

        def walk(d, depth=2):
            for k, v in d.items():
                if isinstance(v, dict):
                    lines.append(f"{'#' * min(depth, 6)} {k}")
                    walk(v, depth + 1)
                elif isinstance(v, float):
                    lines.append(f"- **{k}**: {v:.4f}")
                else:
                    lines.append(f"- **{k}**: {v}")

        walk({k: v for k, v in results.items() if k != "output_path"})
        path.write_text("\n".join(lines))


def parse_args(argv: Optional[Sequence[str]] = None) -> HarnessConfig:
    """(reference run_experiments.py:42-238)"""
    p = argparse.ArgumentParser(description="tvc experiment harness")
    p.add_argument("--experiment-mode", default="four_scenarios", choices=sorted(ExperimentHarness.MODES))
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--num-samples", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--attacks", nargs="+", default=["pgd", "hubness"])
    p.add_argument("--clip-model", default="tiny")
    p.add_argument("--use-sd", action="store_true")
    p.add_argument("--use-qwen", action="store_true")
    p.add_argument("--bank-size", type=int, default=4096)
    p.add_argument("--output-dir", default="./results")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--config", dest="config_path", default=None)
    args = p.parse_args(argv)
    cfg = HarnessConfig(
        experiment_mode=args.experiment_mode,
        dataset=args.dataset,
        data_dir=args.data_dir,
        num_samples=args.num_samples,
        batch_size=args.batch_size,
        attacks=tuple(args.attacks),
        clip_model=args.clip_model,
        use_sd=args.use_sd,
        use_qwen=args.use_qwen,
        bank_size=args.bank_size,
        output_dir=args.output_dir,
        seed=args.seed,
        config_path=args.config_path,
    )
    if cfg.config_path:
        loaded = ConfigLoader().load(cfg.config_path)
        for key in ("dataset", "num_samples", "batch_size", "seed"):
            if key in loaded:
                setattr(cfg, key, loaded[key])
    return cfg


def main(argv: Optional[Sequence[str]] = None) -> Dict[str, Any]:
    """(reference run_experiments.py:3939)"""
    return ExperimentHarness(parse_args(argv)).run()


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()
