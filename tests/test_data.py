"""Data loaders: synthetic fixture, format parsers (on generated files),
prefetch iterator."""

import json

import numpy as np
import pytest

from tvc.data import (
    COCODataset,
    DataConfig,
    DataLoaderManager,
    Flickr30kDataset,
    SyntheticDataset,
    loader_to_list,
)


def test_synthetic_deterministic():
    cfg = DataConfig(dataset="synthetic", image_size=32, max_samples=10, seed=7)
    a, b = SyntheticDataset(cfg), SyntheticDataset(cfg)
    assert len(a) == 10
    assert [s.caption for s in a.samples] == [s.caption for s in b.samples]
    np.testing.assert_array_equal(a.load_image(a.samples[3]), b.load_image(b.samples[3]))


def test_synthetic_batches_shapes():
    ds = SyntheticDataset(DataConfig(image_size=32, max_samples=10, batch_size=4))
    batches = list(ds.batches())
    assert len(batches) == 3  # 4+4+2
    assert batches[0]["images"].shape == (4, 32, 32, 3)
    assert batches[0]["images"].dtype == np.float32
    assert 0.0 <= batches[0]["images"].min() and batches[0]["images"].max() <= 1.0
    assert len(batches[2]["texts"]) == 2


def test_drop_remainder():
    ds = SyntheticDataset(DataConfig(image_size=32, max_samples=10, batch_size=4, drop_remainder=True))
    assert len(list(ds.batches())) == 2


def test_prefetch_matches_sync():
    ds = SyntheticDataset(DataConfig(image_size=32, max_samples=8, batch_size=4))
    sync = list(ds.batches())
    pre = list(ds.prefetch_batches())
    assert len(sync) == len(pre)
    np.testing.assert_array_equal(sync[0]["images"], pre[0]["images"])


def test_coco_parser(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "first caption"},
            {"image_id": 1, "caption": "dup caption for image 1"},
            {"image_id": 2, "caption": "second caption"},
        ],
    }
    (root / "annotations" / "captions_val2017.json").write_text(json.dumps(ann))
    ds = COCODataset(DataConfig(dataset="coco", data_dir=str(tmp_path), split="val"))
    assert len(ds) == 2  # one caption per image
    assert ds.samples[0].caption == "first caption"
    assert ds.samples[0].image_path.endswith("val2017/a.jpg")


def test_flickr_parser(tmp_path):
    root = tmp_path / "flickr30k"
    root.mkdir()
    (root / "results_20130124.token").write_text(
        "1.jpg#0\tA man rides a bike .\n1.jpg#1\tdup\n2.jpg#0\tA dog runs .\n"
    )
    ds = Flickr30kDataset(DataConfig(dataset="flickr30k", data_dir=str(tmp_path)))
    assert len(ds) == 2
    assert ds.samples[0].caption == "A man rides a bike ."


def test_manager_and_loader_to_list():
    mgr = DataLoaderManager(DataConfig(image_size=32, max_samples=6))
    ds = mgr.load_dataset("synthetic")
    tuples = loader_to_list(ds)
    assert len(tuples) == 6
    img, txt, is_adv = tuples[0]
    assert img.shape == (32, 32, 3) and isinstance(txt, str) and is_adv is False
    with pytest.raises(ValueError):
        mgr.load_dataset("imagenet")
