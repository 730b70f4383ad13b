"""Config system: deep-merge, inherits chains, overrides, dotted paths."""

import textwrap

import pytest

from tvc.config import ConfigLoader, apply_overrides, deep_merge, get_by_path


def write(tmp_path, name, body):
    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(body))
    return p


def test_deep_merge_nested_and_list_replace():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": 4}
    upd = {"a": {"c": [9], "e": 5}}
    out = deep_merge(base, upd)
    assert out == {"a": {"b": 1, "c": [9], "e": 5}, "d": 4}
    assert base["a"]["c"] == [1, 2]  # no mutation


def test_apply_overrides_dotted():
    cfg = {"attack": {"epsilon": 0.03, "steps": 10}}
    out = apply_overrides(cfg, {"attack.epsilon": 0.05, "new.key": 1})
    assert out["attack"]["epsilon"] == 0.05
    assert out["attack"]["steps"] == 10
    assert out["new"]["key"] == 1


def test_inherits_chain_and_overrides(tmp_path):
    write(tmp_path, "base.yaml", """
        model: {name: clip, dim: 512}
        batch: 32
    """)
    write(tmp_path, "mid.yaml", """
        inherits: [base.yaml]
        batch: 64
        attack: {kind: pgd}
    """)
    write(tmp_path, "exp.yaml", """
        inherits: [mid.yaml]
        overrides:
          model.dim: 256
          attack: {steps: 5}
    """)
    cfg = ConfigLoader(tmp_path).load("exp.yaml")
    assert cfg["model"] == {"name": "clip", "dim": 256}
    assert cfg["batch"] == 64
    assert cfg["attack"] == {"kind": "pgd", "steps": 5}


def test_circular_inheritance_raises(tmp_path):
    write(tmp_path, "a.yaml", "inherits: [b.yaml]\n")
    write(tmp_path, "b.yaml", "inherits: [a.yaml]\n")
    with pytest.raises(ValueError, match="circular"):
        ConfigLoader(tmp_path).load("a.yaml")


def test_repo_default_config_loads():
    cfg = ConfigLoader().load("default.yaml")
    assert get_by_path(cfg, "models.clip.embed_dim") == 512
    assert get_by_path(cfg, "defense.detector.score_aggregation") == "weighted_mean"
    assert get_by_path(cfg, "defense.detector.weights.text_variants") == 0.4
