"""Serving runtime: micro-batching, HTTP surface, lifecycle, stats."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tvc.serving import ServingConfig, ServingRuntime


@pytest.fixture(scope="module")
def runtime():
    rt = ServingRuntime(
        ServingConfig(
            clip_model="tiny",
            bank_size=64,
            batch_max_size=8,
            batch_max_wait_ms=50.0,
        )
    )
    rt.warmup()
    rt.start(http=True)
    yield rt
    rt.stop()


def _imgs(n, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, size, size, 3)).astype(np.float32)


@pytest.mark.slow
def test_submit_matches_direct_detect(runtime):
    """Padding to the batch bucket must not change per-row results."""
    size = runtime.detector.model.config.image_size
    images = _imgs(3, size)
    texts = [f"query {i}" for i in range(3)]
    got = runtime.submit(images, texts)
    want = runtime.detector.detect_batch(images, texts)
    np.testing.assert_allclose(got["scores"], np.asarray(want.aggregated_score), atol=1e-5)
    assert got["is_adversarial"] == np.asarray(want.is_adversarial).tolist()


@pytest.mark.slow
def test_concurrent_submits_coalesce(runtime):
    """Two requests inside the batching window run as ONE detector batch."""
    size = runtime.detector.model.config.image_size
    before = runtime.stats()["batches"]
    results = {}

    def post(name, seed):
        results[name] = runtime.submit(_imgs(2, size, seed), [f"{name}{i}" for i in range(2)])

    t1 = threading.Thread(target=post, args=("a", 1))
    t2 = threading.Thread(target=post, args=("b", 2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(results["a"]["scores"]) == 2
    assert len(results["b"]["scores"]) == 2
    after = runtime.stats()
    assert after["batches"] == before + 1  # coalesced
    assert after["queries"] >= 4


def test_http_endpoints(runtime):
    base = runtime.address
    with urllib.request.urlopen(f"{base}/health") as r:
        health = json.loads(r.read())
    assert health == {"status": "ok", "warm": True}

    size = runtime.detector.model.config.image_size
    payload = json.dumps(
        {"images": _imgs(2, size).tolist(), "texts": ["a", "b"]}
    ).encode()
    req = urllib.request.Request(
        f"{base}/v1/detect", data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert len(out["scores"]) == 2 and "latency_ms" in out

    with urllib.request.urlopen(f"{base}/stats") as r:
        stats = json.loads(r.read())
    for key in ("uptime_s", "requests", "queries", "batches", "mean_batch_size"):
        assert key in stats
    assert stats["latency_p50_ms"] > 0


def test_http_error_paths(runtime):
    base = runtime.address
    bad = json.dumps({"images": [[0.0]], "texts": ["a", "b"]}).encode()
    req = urllib.request.Request(f"{base}/v1/detect", data=bad)
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope")
    assert e.value.code == 404


def test_submit_shape_validation(runtime):
    with pytest.raises(ValueError):
        runtime.submit(np.zeros((2, 4, 4, 3), np.float32), ["one text only"])


def test_backlog_coalesces_past_deadline():
    """Requests that piled up while a batch was running coalesce even
    though the micro-batch deadline long expired — the ready queue is
    drained regardless of the wait window."""
    from tvc.serving import _Request

    rt = ServingRuntime(
        ServingConfig(
            clip_model="tiny", bank_size=32, batch_max_size=8,
            batch_max_wait_ms=0.0,  # deadline always already expired
        )
    )
    size = rt.detector.model.config.image_size
    reqs = [_Request(_imgs(2, size, seed=i), [f"q{i}a", f"q{i}b"]) for i in range(3)]
    for r in reqs:
        rt._queue.put(r)  # enqueue BEFORE the batcher starts
    rt.start(http=False)
    for r in reqs:
        assert r.event.wait(60) and r.error is None
    assert rt.stats()["batches"] == 1  # one coalesced detector call
    rt.stop()


@pytest.mark.slow
def test_oversize_request_chunks_to_warm_buckets():
    """A request larger than batch_max_size splits into warmed-bucket
    chunks — no live-path compile of a novel shape."""
    rt = ServingRuntime(
        ServingConfig(clip_model="tiny", bank_size=32, batch_max_size=4)
    )
    rt.warmup()
    rt.start(http=False)
    size = rt.detector.model.config.image_size
    images = _imgs(6, size)
    texts = [f"q{i}" for i in range(6)]
    out = rt.submit(images, texts)
    assert len(out["scores"]) == 6
    want = rt.detector.detect_batch(images, texts)
    np.testing.assert_allclose(out["scores"], np.asarray(want.aggregated_score), atol=1e-5)
    hist = rt.stats()["batch_bucket_counts"]
    assert hist == {"2": 1, "4": 1}  # 6 -> chunk 4 + chunk 2
    rt.stop()


def test_fixed_text_bucket_no_new_programs(runtime):
    """Long texts must NOT compile a new program shape: the serving
    detector runs a fixed text bucket, truncating with EOT in-window."""
    det = runtime.detector
    assert det.config.text_bucket == 32
    size = det.model.config.image_size
    long_texts = ["word " * 200, "tiny"]
    out = runtime.submit(_imgs(2, size), long_texts)
    assert len(out["scores"]) == 2 and np.isfinite(out["scores"]).all()


@pytest.mark.slow
def test_int8_serving_engages_fused_path():
    """int8_serving must actually flip the kernels on (it only engages
    through fused_attention — a bare int8 flag was a silent no-op)."""
    rt = ServingRuntime(
        ServingConfig(clip_model="tiny", bank_size=16, batch_max_size=2,
                      int8_serving=True)
    )
    assert rt.detector.model.config.int8_serving
    assert rt.detector.model.config.fused_attention
    rt.start(http=False)
    size = rt.detector.model.config.image_size
    out = rt.submit(_imgs(1, size), ["x"])
    assert len(out["scores"]) == 1
    assert rt.detector._serving is not None
    rt.stop()


def test_cancelled_request_skipped():
    """A request whose submitter timed out is dropped by the batcher,
    not processed into a wasted device batch."""
    from tvc.serving import _Request

    rt = ServingRuntime(
        ServingConfig(clip_model="tiny", bank_size=16, batch_max_size=4)
    )
    size = rt.detector.model.config.image_size
    dead = _Request(_imgs(1, size), ["dead"])
    dead.cancelled = True
    live = _Request(_imgs(1, size), ["live"])
    rt._queue.put(dead)
    rt._queue.put(live)
    rt.start(http=False)
    assert live.event.wait(60) and live.error is None
    rt.stop()
    assert not dead.event.is_set()  # never processed
    assert rt.stats()["queries"] == 1


@pytest.mark.slow
def test_stop_and_restart():
    rt = ServingRuntime(
        ServingConfig(clip_model="tiny", bank_size=32, batch_max_size=4)
    )
    rt.start(http=False)
    size = rt.detector.model.config.image_size
    out = rt.submit(_imgs(1, size), ["x"])
    assert len(out["scores"]) == 1
    rt.stop()
    assert rt._batcher is None
    # requests still queued at stop() fail fast instead of timing out
    req_after = __import__("tvc.serving", fromlist=["_Request"])._Request(
        _imgs(1, size), ["y"]
    )
    rt._queue.put(req_after)
    rt.stop()
    assert req_after.event.is_set() and req_after.error is not None
    # submit on a stopped runtime raises instead of blocking to timeout
    with pytest.raises(RuntimeError):
        rt.submit(_imgs(1, size), ["z"])


def test_serving_hub_probe_armed():
    """ServingConfig.hub_probe_texts arms + calibrates the hub screen on
    the production runtime; flagged details ride the serving result."""
    import numpy as np

    from tvc.serving import ServingConfig, ServingRuntime

    rt = ServingRuntime(
        ServingConfig(
            clip_model="tiny",
            bank_size=64,
            hub_probe_texts=tuple(
                f"a probe caption number {i} about scenes" for i in range(16)
            ),
        )
    )
    rng = np.random.default_rng(0)
    size = rt.detector.model.config.image_size
    clean = rng.random((8, size, size, 3)).astype(np.float32)
    thr = rt.calibrate_hub_probe(clean, quantile=0.9)
    assert np.isfinite(thr)
    res = rt.detector.detect_batch(clean, [f"query {i} text" for i in range(8)])
    assert "hub_probe_score" in res.details


def test_drift_monitor_detects_campaign_shift():
    """The rolling-score KS monitor: no alert while served traffic matches
    the clean reference; alert once a campaign of shifted-score queries
    dominates the window (no per-query flag needed). Uses an injected
    detector so only the serving-layer logic is under test."""

    class _Det:
        def __init__(self):
            self.mu = 0.5
            self.calls = 0

        def detect_batch(self, images, texts):
            n = len(texts)
            self.calls += 1
            rng = np.random.default_rng(self.calls)
            scores = rng.normal(self.mu, 0.02, n)

            class R:
                aggregated_score = scores
                is_adversarial = scores < 0.0  # never fires per-query

            return R()

    rt = ServingRuntime(
        ServingConfig(
            clip_model="tiny",
            batch_max_size=8,
            batch_max_wait_ms=0.0,
            drift_window=64,
            drift_min_samples=32,
            drift_ks_alert=0.25,
        ),
        detector=_Det(),
    )
    rt.set_drift_reference(np.random.default_rng(0).normal(0.5, 0.02, 256))
    rt.start(http=False)
    imgs = np.zeros((8, 4, 4, 3), np.float32)
    texts = [f"q{i}" for i in range(8)]
    for _ in range(8):  # fill the window with clean-distribution traffic
        rt.submit(imgs, texts)
    st = rt.drift_status()
    assert st["window_n"] >= 32 and st["alert"] is False, st
    rt.detector.mu = 0.35  # campaign: individually-borderline queries
    for _ in range(8):
        rt.submit(imgs, texts)
    st = rt.drift_status()
    assert st["alert"] is True and st["ks"] > 0.25, st
    assert rt.stats()["drift"]["alert"] is True
    rt.stop()


def test_drift_monitor_self_reference_when_uncalibrated():
    """Without an explicit clean reference the first full window becomes
    the baseline, reported as such."""

    class _Det:
        def detect_batch(self, images, texts):
            n = len(texts)

            class R:
                aggregated_score = np.full(n, 0.5)
                is_adversarial = np.zeros(n, bool)

            return R()

    rt = ServingRuntime(
        ServingConfig(
            clip_model="tiny",
            batch_max_size=8,
            batch_max_wait_ms=0.0,
            drift_window=16,
            drift_min_samples=8,
        ),
        detector=_Det(),
    )
    rt.start(http=False)
    imgs = np.zeros((8, 4, 4, 3), np.float32)
    for _ in range(4):
        rt.submit(imgs, [f"q{i}" for i in range(8)])
    st = rt.drift_status()
    assert st["reference_source"] == "first_served_traffic"
    assert st["reference_n"] == 16
    rt.stop()
