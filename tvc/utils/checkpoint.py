"""Checkpoint/resume utilities (SURVEY.md §5.4).

The reference has no training loop; its persistent state is FAISS indexes,
reference banks, and config/stat JSONs. Here the same roles are covered by
npz/json persistence on the components themselves (EmbeddingBank.save,
ReferenceBank.save, detector.save_model) plus this module:

* ``CheckpointManager`` — versioned, retention-limited checkpoints of
  arbitrary pytrees (model params, optimizer state, banks) using orbax
  when available, msgpack otherwise;
* resume semantics: ``latest_step`` + ``restore``.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._orbax = None
        try:
            import orbax.checkpoint as ocp

            self._orbax = ocp
        except ImportError:
            pass

    # -- bookkeeping -----------------------------------------------------------
    def _step_dir(self, step: int) -> Path:
        return self.dir / f"step_{step:08d}"

    def steps(self) -> List[int]:
        out = []
        for p in self.dir.glob("step_*"):
            m = re.match(r"step_(\d+)$", p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        s = self.steps()
        return s[-1] if s else None

    def _gc(self) -> None:
        steps = self.steps()
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    # -- save/restore -----------------------------------------------------------
    def save(self, step: int, tree: Any, metadata: Optional[Dict] = None) -> str:
        d = self._step_dir(step)
        if self._orbax is not None:
            ckpt = self._orbax.PyTreeCheckpointer()
            if d.exists():
                shutil.rmtree(d)
            ckpt.save(d.resolve() / "tree", tree)
        else:
            from flax import serialization

            d.mkdir(parents=True, exist_ok=True)
            (d / "tree.msgpack").write_bytes(serialization.to_bytes(tree))
        if metadata:
            (d / "metadata.json").write_text(json.dumps(metadata, default=str))
        self._gc()
        return str(d)

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        d = self._step_dir(step)
        if self._orbax is not None and (d / "tree").exists():
            ckpt = self._orbax.PyTreeCheckpointer()
            return ckpt.restore(d.resolve() / "tree", item=template)
        from flax import serialization

        return serialization.from_bytes(template, (d / "tree.msgpack").read_bytes())

    def metadata(self, step: Optional[int] = None) -> Dict:
        step = step if step is not None else self.latest_step()
        p = self._step_dir(step) / "metadata.json"
        return json.loads(p.read_text()) if p.exists() else {}


class StageCheckpointer:
    """Resumable stage snapshots for long experiment runs.

    This implements the fault tolerance the reference only DECLARES in
    config (reference configs/experiments/coco_pgd_full.yaml:198-214:
    checkpointing + auto_resume keys with no implementation anywhere in
    its code). Each completed stage saves one npz (+ optional JSON
    payload) under ``directory/<fingerprint>/``; a resumed run with the
    same fingerprint (config + data hash) skips completed stages and a
    changed fingerprint naturally starts fresh — stale snapshots can never
    leak into a different experiment.
    """

    def __init__(self, directory: str, fingerprint: str):
        self.dir = Path(directory) / fingerprint
        self.dir.mkdir(parents=True, exist_ok=True)

    def _paths(self, stage: str):
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", stage)
        return self.dir / f"{safe}.npz", self.dir / f"{safe}.json"

    def has(self, stage: str) -> bool:
        npz, js = self._paths(stage)
        return npz.exists() or js.exists()

    def save(
        self,
        stage: str,
        arrays: Optional[Dict[str, Any]] = None,
        meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        import numpy as np

        npz, js = self._paths(stage)
        if arrays:
            # tmp name must keep the .npz suffix — np.savez appends one
            # to anything else, breaking the rename
            tmp = npz.with_name(npz.stem + ".tmp.npz")
            np.savez_compressed(
                tmp, **{k: np.asarray(v) for k, v in arrays.items() if v is not None}
            )
            tmp.replace(npz)  # atomic: a kill mid-write never leaves a
            #                   half-snapshot that a resume would trust
        if meta is not None:
            tmpj = js.with_suffix(".json.tmp")
            tmpj.write_text(json.dumps(meta, default=float))
            tmpj.replace(js)

    def load(self, stage: str):
        """Returns (arrays dict or {}, meta dict or None)."""
        import numpy as np

        npz, js = self._paths(stage)
        arrays = {}
        if npz.exists():
            with np.load(npz, allow_pickle=False) as z:
                arrays = {k: z[k] for k in z.files}
        meta = json.loads(js.read_text()) if js.exists() else None
        return arrays, meta

    def clear(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
