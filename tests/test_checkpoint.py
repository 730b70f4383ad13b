"""CheckpointManager: save/restore/retention/resume."""

import numpy as np
import pytest

from tvc.utils.checkpoint import CheckpointManager


def tree(seed):
    rng = np.random.default_rng(seed)
    return {"w": rng.normal(size=(4, 4)).astype(np.float32), "b": rng.normal(size=(4,)).astype(np.float32)}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    t = tree(0)
    mgr.save(1, t, metadata={"loss": 0.5})
    restored = mgr.restore(tree(9), step=1)
    np.testing.assert_array_equal(restored["w"], t["w"])
    assert mgr.metadata(1)["loss"] == 0.5


def test_latest_and_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for s in (1, 5, 9):
        mgr.save(s, tree(s))
    assert mgr.latest_step() == 9
    assert mgr.steps() == [5, 9]  # step 1 garbage-collected
    restored = mgr.restore(tree(0))  # latest by default
    np.testing.assert_array_equal(restored["w"], tree(9)["w"])


def test_restore_empty_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path)).restore(tree(0))
