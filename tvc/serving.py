"""Production serving runtime: dynamic micro-batching HTTP service over
the fused detection path.

This is the runnable replacement for the reference's deployment service
layer (scripts/deploy.py:75-101 ``deploy_system`` →
``quick_start.start_service`` — which imports ``quick_start`` /
``auto_deploy`` modules that do not exist anywhere in the shipped repo,
so the reference service cannot actually start). Here the service is a
first-class component:

- **Dynamic micro-batching** (Triton-style): requests arriving within a
  short window are coalesced into ONE batched detector call, so the
  fused TPU serving program (encode + bank top-k + Pallas scoring —
  ``tvc/parallel/steps.make_serving_step``) always runs at batch size,
  never per-request. Batches are padded up to power-of-two buckets so
  the number of compiled programs stays O(log batch_max).
- **Lifecycle**: ``start()`` / ``stop()`` / ``warmup()`` (pre-compiles
  the bucket programs so the first request doesn't pay XLA compile).
- **Observability**: ``/health`` and ``/stats`` endpoints (uptime,
  request/query counters, batch-size histogram, P50/P99 latency).

The HTTP layer is stdlib-only (``http.server``) and binds localhost by
default; the in-process ``submit()`` API serves embedded users (the CLI
smoke path and tests use it directly).
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ServingConfig:
    clip_model: str = "tiny"
    #: embedding bank: path to a persisted EmbeddingBank, else a random
    #: placeholder bank of this many rows (smoke/demo mode)
    bank_path: Optional[str] = None
    bank_size: int = 1024
    #: micro-batcher: flush when this many queries are queued ...
    batch_max_size: int = 64
    #: ... or when the oldest queued request has waited this long
    batch_max_wait_ms: float = 5.0
    host: str = "127.0.0.1"
    port: int = 0  # 0 = ephemeral
    #: detector knobs forwarded to DetectorConfig
    detection_threshold: Optional[float] = None
    num_text_variants: int = 5
    #: serve with the int8 W8A8 Pallas tower kernels (the production
    #: precision bench.py measures; +22% defended q/s, ranking identical
    #: to bf16 on the trained fixture). Implies the fused-attention tower
    #: kernels — the int8 path only engages through them.
    int8_serving: bool = False
    #: fixed text-token bucket (multiple of 8): keeps the compiled program
    #: set to {batch buckets} x one text shape, all covered by warmup();
    #: longer texts truncate with EOT pinned in-window
    text_bucket: int = 32
    #: hub-probe defense (AdversarialDetector.set_hub_probe): captions for
    #: the defender's secret probe pool — arms the k-occurrence-style hub
    #: screen the adaptive evaluation showed is required against white-box
    #: hub attacks (docs/adaptive_attack.md). Calibrate at runtime with
    #: runtime.calibrate_hub_probe(clean_images).
    hub_probe_texts: tuple = ()
    #: score-drift monitor: rolling window of served aggregate scores,
    #: KS-tested against a clean reference distribution. Catches
    #: campaign-level shifts (many borderline-adversarial queries, a
    #: distribution the per-query threshold doesn't flag) that no single
    #: query reveals. Set the reference explicitly from calibration
    #: traffic with set_drift_reference(); otherwise the first full
    #: window of served scores self-references (reported as such).
    #: 0 disables the monitor.
    drift_window: int = 512
    #: minimum window fill before a drift verdict is computed
    drift_min_samples: int = 64
    #: alert when the two-sample KS statistic exceeds this
    drift_ks_alert: float = 0.25
    seed: int = 0


class _Request:
    __slots__ = (
        "images", "texts", "event", "result", "error", "t_enqueue", "cancelled"
    )

    def __init__(self, images: np.ndarray, texts: List[str]):
        self.images = images
        self.texts = texts
        self.event = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None
        self.t_enqueue = time.time()
        self.cancelled = False  # set by a timed-out submit(); batcher skips


class ServingRuntime:
    """Owns the model/bank/detector and the micro-batching loop.

    ``detector`` may be injected (any object with a
    ``detect_batch(images, texts)`` returning ``.aggregated_score`` /
    ``.is_adversarial``); otherwise one is built from the config.
    """

    def __init__(self, config: Optional[ServingConfig] = None, detector=None):
        self.config = config or ServingConfig()
        self.detector = detector or self._build_detector()
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._batcher: Optional[threading.Thread] = None
        self._server: Optional[ThreadingHTTPServer] = None
        self._server_thread: Optional[threading.Thread] = None
        self._t_start = time.time()
        self._warm = False
        self._lock = threading.Lock()
        self._enqueue_lock = threading.Lock()
        self._latencies: deque = deque(maxlen=1024)  # seconds, per request
        self.counters: Dict[str, Any] = {
            "requests": 0,
            "queries": 0,
            "batches": 0,
            "batch_size_sum": 0,
            "errors": 0,
            "batch_bucket_counts": {},  # padded bucket size -> detector calls
        }
        self._drift_scores: deque = deque(maxlen=max(self.config.drift_window, 1))
        self._drift_ref: Optional[np.ndarray] = None
        self._drift_ref_source: Optional[str] = None

    @property
    def _max_bucket(self) -> int:
        """Largest power-of-two bucket <= batch_max_size — the biggest
        program warmup() compiles; live batches never exceed it."""
        b = 1
        while b * 2 <= self.config.batch_max_size:
            b *= 2
        return b

    # -- construction ----------------------------------------------------------
    def _build_detector(self):
        from tvc.detector import AdversarialDetector, DetectorConfig
        from tvc.models import CLIPConfig, CLIPModel
        from tvc.retrieval import MultiModalRetriever, RetrievalConfig

        cfg = self.config
        if cfg.clip_model == "tiny_coco_trained":
            from tvc.fixtures import load_trained_tiny_coco

            model = load_trained_tiny_coco(seed=cfg.seed)
        else:
            model = CLIPModel(
                CLIPConfig.from_name(
                    cfg.clip_model,
                    int8_serving=cfg.int8_serving,
                    # int8 only engages through the fused tower kernels
                    # (CLIPModel.infer_* checks fused_attention first)
                    fused_attention=cfg.int8_serving,
                ),
                seed=cfg.seed,
            )
        retriever = MultiModalRetriever(model, RetrievalConfig())
        if cfg.bank_path:
            retriever.load(cfg.bank_path)
        else:
            rng = np.random.default_rng(cfg.seed)
            embs = rng.standard_normal(
                (cfg.bank_size, model.config.embed_dim), dtype=np.float32
            )
            embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
            retriever.build_image_index(embeddings=embs)
        det_kw: Dict[str, Any] = {
            "num_text_variants": cfg.num_text_variants,
            "text_bucket": cfg.text_bucket,
        }
        if cfg.detection_threshold is not None:
            det_kw["detection_threshold"] = cfg.detection_threshold
        det = AdversarialDetector(
            model, retriever=retriever, config=DetectorConfig(**det_kw)
        )
        if cfg.hub_probe_texts:
            det.set_hub_probe(texts=list(cfg.hub_probe_texts))
        return det

    def calibrate_hub_probe(self, clean_images, quantile: float = 0.995) -> float:
        """Calibrate the armed hub-probe threshold on clean traffic."""
        return self.detector.calibrate_hub_probe(clean_images, quantile=quantile)

    # -- score-drift monitor -----------------------------------------------------
    def set_drift_reference(self, clean_scores) -> None:
        """Pin the drift monitor's clean reference distribution (use the
        aggregate scores of known-clean calibration traffic — e.g. the
        same batch that calibrated the detection threshold)."""
        ref = np.asarray(clean_scores, np.float64).ravel()
        if ref.size < 2:
            raise ValueError("drift reference needs >= 2 clean scores")
        with self._lock:
            self._drift_ref = ref
            self._drift_ref_source = "calibration"

    def _drift_feed(self, scores: np.ndarray) -> None:
        """Called by _run_batch with each chunk's REAL (unpadded) scores."""
        if self.config.drift_window <= 0:
            return
        with self._lock:
            self._drift_scores.extend(float(s) for s in scores)
            if (
                self._drift_ref is None
                and len(self._drift_scores) >= self._drift_scores.maxlen
            ):
                # no calibration reference supplied: the first full window
                # of live traffic becomes the baseline (reported as such —
                # it assumes that traffic was predominantly clean)
                self._drift_ref = np.fromiter(self._drift_scores, np.float64)
                self._drift_ref_source = "first_served_traffic"
                self._drift_scores.clear()

    def drift_status(self) -> Dict[str, Any]:
        """Two-sample KS test of the rolling served-score window against
        the clean reference. ``alert`` means the score distribution has
        shifted — e.g. an attack campaign of individually-borderline
        queries — even if few individual queries crossed the threshold."""
        with self._lock:
            ref = self._drift_ref
            src = self._drift_ref_source
            win = np.fromiter(self._drift_scores, np.float64)
        out: Dict[str, Any] = {
            "enabled": self.config.drift_window > 0,
            "reference_source": src,
            "reference_n": 0 if ref is None else int(ref.size),
            "window_n": int(win.size),
            "ks": None,
            "p_value": None,
            "alert": False,
        }
        if ref is None or win.size < self.config.drift_min_samples:
            return out
        from scipy.stats import ks_2samp

        ks = ks_2samp(ref, win)
        out["ks"] = round(float(ks.statistic), 4)
        out["p_value"] = float(ks.pvalue)
        out["alert"] = bool(
            ks.statistic > self.config.drift_ks_alert and ks.pvalue < 0.01
        )
        return out

    # -- lifecycle ---------------------------------------------------------------
    def warmup(self) -> None:
        """Pre-compile every batch-bucket program (power-of-two buckets up
        to batch_max_size) so no live request pays an XLA compile."""
        model = getattr(self.detector, "model", None)
        size = getattr(getattr(model, "config", None), "image_size", 32)
        b = 1
        while b <= self._max_bucket:
            images = np.zeros((b, size, size, 3), np.float32)
            self.detector.detect_batch(images, ["warmup"] * b)
            b *= 2
        self._warm = True

    def start(self, http: bool = True) -> None:
        self._stop.clear()
        self._t_start = time.time()
        self._batcher = threading.Thread(
            target=self._batch_loop, name="tvc-batcher", daemon=True
        )
        self._batcher.start()
        if http:
            handler = _make_handler(self)
            self._server = ThreadingHTTPServer(
                (self.config.host, self.config.port), handler
            )
            self._server_thread = threading.Thread(
                target=self._server.serve_forever, name="tvc-http", daemon=True
            )
            self._server_thread.start()

    @property
    def address(self) -> Optional[str]:
        if self._server is None:
            return None
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self._stop.set()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._batcher is not None:
            self._batcher.join(timeout=5)
            self._batcher = None
        # fail fast for anything still queued instead of letting callers
        # block until their submit() timeout. The enqueue lock in submit()
        # closes the race: a request that passed the running check is in
        # the queue before this drain takes the lock.
        with self._enqueue_lock:
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                req.error = "serving runtime stopped"
                req.event.set()

    # -- request path -----------------------------------------------------------
    def submit(self, images, texts: Sequence[str], timeout: float = 60.0):
        """Enqueue one request (any number of queries) and block for its
        results. Thread-safe; concurrent submits coalesce into one
        batched detector call."""
        images = np.asarray(images, np.float32)
        texts = [str(t) for t in texts]
        if images.ndim != 4 or len(texts) != images.shape[0]:
            raise ValueError(
                f"need images [B, H, W, C] with len(texts) == B; got "
                f"images {images.shape} and {len(texts)} texts"
            )
        req = _Request(images, texts)
        with self._enqueue_lock:
            if self._batcher is None or self._stop.is_set():
                raise RuntimeError("serving runtime is not running")
            self._queue.put(req)
        if not req.event.wait(timeout):
            # the batcher drops cancelled requests instead of burning a
            # device batch on a caller that already gave up
            req.cancelled = True
            raise TimeoutError("serving request timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        with self._lock:
            self._latencies.append(time.time() - req.t_enqueue)
        return req.result

    def _batch_loop(self) -> None:
        cfg = self.config
        cap = self._max_bucket
        carry: Optional[_Request] = None  # admitted but overshot last batch
        while not self._stop.is_set():
            if carry is not None:
                first, carry = carry, None
            else:
                try:
                    first = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
            if first.cancelled:
                continue
            batch = [first]
            total = first.images.shape[0]
            deadline = first.t_enqueue + cfg.batch_max_wait_ms / 1e3
            while total < cap:
                try:
                    # drain already-queued requests even past the deadline
                    # — under backlog the deadline is long expired by the
                    # time a batch starts forming, and breaking on it
                    # would collapse every batch to size 1
                    nxt = self._queue.get_nowait()
                except queue.Empty:
                    wait = deadline - time.time()
                    if wait <= 0:
                        break
                    try:
                        nxt = self._queue.get(timeout=wait)
                    except queue.Empty:
                        break
                if nxt.cancelled:
                    continue
                if total + nxt.images.shape[0] > cap:
                    carry = nxt  # would overshoot the largest warmed bucket
                    break
                batch.append(nxt)
                total += nxt.images.shape[0]
            self._run_batch(batch)
        if carry is not None:
            carry.error = "serving runtime stopped"
            carry.event.set()

    @staticmethod
    def _bucket(n: int) -> int:
        """Smallest power of two >= n."""
        b = 1
        while b < n:
            b *= 2
        return b

    def _run_batch(self, batch: List[_Request]) -> None:
        try:
            images = np.concatenate([r.images for r in batch])
            texts: List[str] = sum((r.texts for r in batch), [])
            n = images.shape[0]
            cap = self._max_bucket
            scores = np.empty((n,), np.float64)
            is_adv = np.empty((n,), bool)
            # chunk to the largest warmed bucket (a single request may
            # exceed it), padding each chunk to a power of two: every
            # program shape the live path runs was compiled by warmup()
            for off in range(0, n, cap):
                part_img = images[off : off + cap]
                part_txt = texts[off : off + cap]
                m = part_img.shape[0]
                b = self._bucket(m)
                if b > m:
                    pad_img = np.zeros((b - m,) + part_img.shape[1:], part_img.dtype)
                    part_img = np.concatenate([part_img, pad_img])
                    part_txt = part_txt + ["pad"] * (b - m)
                det = self.detector.detect_batch(part_img, part_txt)
                scores[off : off + m] = np.asarray(det.aggregated_score)[:m]
                is_adv[off : off + m] = np.asarray(det.is_adversarial)[:m]
                self._drift_feed(scores[off : off + m])
                with self._lock:
                    self.counters["batches"] += 1
                    self.counters["batch_size_sum"] += m
                    hist = self.counters["batch_bucket_counts"]
                    hist[b] = hist.get(b, 0) + 1
            off = 0
            for r in batch:
                k = r.images.shape[0]
                r.result = {
                    "scores": scores[off : off + k].tolist(),
                    "is_adversarial": is_adv[off : off + k].tolist(),
                }
                off += k
                r.event.set()
            with self._lock:
                self.counters["requests"] += len(batch)
                self.counters["queries"] += n
        except Exception as e:  # deliver the failure to every waiter
            with self._lock:
                self.counters["errors"] += 1
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
                r.event.set()

    # -- observability ------------------------------------------------------------
    def stats(self) -> Dict[str, Any]:
        with self._lock:
            lat = sorted(self._latencies)
            c = dict(self.counters)
            c["batch_bucket_counts"] = {
                str(k): v for k, v in sorted(c["batch_bucket_counts"].items())
            }
        out = {
            "uptime_s": round(time.time() - self._t_start, 3),
            "warm": self._warm,
            **c,
            "mean_batch_size": (
                round(c["batch_size_sum"] / c["batches"], 2) if c["batches"] else 0.0
            ),
        }
        if lat:
            out["latency_p50_ms"] = round(1e3 * lat[len(lat) // 2], 3)
            out["latency_p99_ms"] = round(1e3 * lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3)
        out["drift"] = self.drift_status()
        return out


def _make_handler(runtime: ServingRuntime):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok", "warm": runtime._warm})
            elif self.path == "/stats":
                self._send(200, runtime.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/v1/detect":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                images = np.asarray(req["images"], np.float32)
                texts = list(req["texts"])
                t0 = time.time()
                result = runtime.submit(images, texts)
                result["latency_ms"] = round(1e3 * (time.time() - t0), 3)
                self._send(200, result)
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_main(argv: Optional[Sequence[str]] = None) -> None:
    """``mm-serve``: stand up the micro-batching detection service."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--clip-model", default="tiny")
    p.add_argument("--bank-path", default=None)
    p.add_argument("--bank-size", type=int, default=1024)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--batch-max-size", type=int, default=64)
    p.add_argument("--batch-max-wait-ms", type=float, default=5.0)
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--int8", action="store_true", help="int8 W8A8 serving kernels")
    p.add_argument(
        "--drift-window", type=int, default=512,
        help="rolling score window for the drift monitor (0 disables)",
    )
    p.add_argument("--drift-ks-alert", type=float, default=0.25)
    args = p.parse_args(argv)
    rt = ServingRuntime(
        ServingConfig(
            clip_model=args.clip_model,
            bank_path=args.bank_path,
            bank_size=args.bank_size,
            host=args.host,
            port=args.port,
            batch_max_size=args.batch_max_size,
            batch_max_wait_ms=args.batch_max_wait_ms,
            int8_serving=args.int8,
            drift_window=args.drift_window,
            drift_ks_alert=args.drift_ks_alert,
        )
    )
    if not args.no_warmup:
        print("warming up (compiling bucket programs)...")
        rt.warmup()
    rt.start()
    print(f"serving on {rt.address}  (POST /v1/detect, GET /health /stats)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        rt.stop()


if __name__ == "__main__":
    serve_main()
