"""Hardware detection + device runtime surface, TPU-reinterpreted.

Covers reference src/utils/hardware_detector.py (HardwareDetector :32,
GPUInfo :511, SystemInfo :537, detect_and_configure :561) and the
still-useful parts of src/utils/cuda_utils.py (memory stats :167+, batch
auto-tuning :561) — XLA owns allocation on TPU, so the OOM-retry machinery
reduces to batch-size halving around a jit call.
"""

from __future__ import annotations

import dataclasses
import os
import platform
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class DeviceInfo:
    """(reference GPUInfo :511, generalized)"""

    index: int
    platform: str  # tpu | gpu | cpu
    kind: str  # e.g. "TPU v5 lite"
    memory_bytes: Optional[int] = None
    coords: Optional[tuple] = None


@dataclasses.dataclass
class SystemInfo:
    """(reference SystemInfo :537)"""

    platform: str
    num_devices: int
    devices: List[DeviceInfo]
    host_count: int
    cpu_count: int
    memory_gb: float
    python_version: str
    jax_version: str


class HardwareDetector:
    """Probes the accelerator topology (reference HardwareDetector :32)."""

    def __init__(self):
        self._info: Optional[SystemInfo] = None

    def detect(self) -> SystemInfo:
        if self._info is not None:
            return self._info
        import jax

        devices = jax.devices()
        infos = []
        for d in devices:
            mem = None
            try:
                stats = d.memory_stats()
                if stats:
                    mem = stats.get("bytes_limit")
            except Exception:
                pass
            infos.append(
                DeviceInfo(
                    index=d.id,
                    platform=d.platform,
                    kind=getattr(d, "device_kind", str(d)),
                    memory_bytes=mem,
                    coords=getattr(d, "coords", None),
                )
            )
        try:
            import psutil

            mem_gb = psutil.virtual_memory().total / 1e9
            cpus = psutil.cpu_count() or os.cpu_count() or 1
        except ImportError:
            mem_gb = 0.0
            cpus = os.cpu_count() or 1
        self._info = SystemInfo(
            platform=jax.default_backend(),
            num_devices=len(devices),
            devices=infos,
            host_count=jax.process_count(),
            cpu_count=cpus,
            memory_gb=mem_gb,
            python_version=platform.python_version(),
            jax_version=jax.__version__,
        )
        return self._info

    def has_tpu(self) -> bool:
        return self.detect().platform == "tpu"

    def get_available_devices(self) -> List[DeviceInfo]:
        return self.detect().devices

    def summary(self) -> Dict[str, Any]:
        info = self.detect()
        return {
            "platform": info.platform,
            "num_devices": info.num_devices,
            "device_kinds": sorted({d.kind for d in info.devices}),
            "hosts": info.host_count,
            "jax": info.jax_version,
        }


def probe_device_health(timeout_s: float = 30.0, rtt_probes: int = 3) -> Dict[str, Any]:
    """Bounded end-to-end device health probe.

    ``jax.devices()`` succeeding does NOT mean the device path is usable:
    on a tunneled backend (axon) platform registration stays up while the
    execution queue browns out, and the first dispatch+readback of a fresh
    process can then hang for minutes (observed >390s, 2026-08-20 — see
    docs/architecture.md). The only valid liveness signal is a completed
    dispatch+readback, so that is what this runs — on a daemon thread with
    a hard bound, never hanging the caller.

    Returns ``{"healthy": bool, "first_readback_s": float | None,
    "rtt_ms": [...], "platform": str, "diagnosis": str}``. Replaces the
    reference's nvidia-smi-style liveness checks (cuda_utils.py:167+),
    which assume a locally attached device that is reachable iff present.
    """
    import threading
    import time as _time

    import jax
    import jax.numpy as jnp

    out: Dict[str, Any] = {
        "healthy": False,
        "first_readback_s": None,
        "rtt_ms": [],
        "platform": None,
        "diagnosis": "",
    }
    try:
        out["platform"] = jax.default_backend()
    except Exception as e:  # backend init itself failed
        out["diagnosis"] = f"backend init failed: {type(e).__name__}: {e}"
        return out

    done = threading.Event()
    t0 = _time.time()

    def _readback():
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.zeros((8, 8)))[0, 0])
        out["first_readback_s"] = round(_time.time() - t0, 3)
        # steady-state RTT once live (drifts over minutes; probe fresh)
        for _ in range(rtt_probes):
            t1 = _time.time()
            float(f(jnp.zeros((8, 8)))[0, 0])
            out["rtt_ms"].append(round((_time.time() - t1) * 1e3, 1))
        done.set()

    th = threading.Thread(target=_readback, daemon=True)
    th.start()
    if not done.wait(timeout_s):
        out["diagnosis"] = (
            f"dispatch+readback still pending after {timeout_s:.0f}s — "
            "execution path down (tunnel brownout / queue backlog) even "
            "though platform registration succeeded"
        )
        return out
    out["healthy"] = True
    out["diagnosis"] = "ok"
    return out


def device_memory_stats(device=None) -> Dict[str, int]:
    """Live HBM stats (replaces GPUMonitor, reference cuda_utils.py:167+)."""
    import jax

    d = device or jax.devices()[0]
    try:
        return dict(d.memory_stats() or {})
    except Exception:
        return {}


class DeviceMonitor:
    """Background HBM polling (GPUMonitor role, reference
    cuda_utils.py:167+). Samples ``memory_stats`` of each device on an
    interval; ``summary()`` reports peak/current usage."""

    def __init__(self, interval_s: float = 1.0):
        import threading

        self.interval_s = interval_s
        self._samples: List[Dict[str, int]] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def _poll(self) -> None:
        while not self._stop.wait(self.interval_s):
            stats = device_memory_stats()
            if stats:
                with self._lock:
                    self._samples.append(stats)

    def start(self) -> "DeviceMonitor":
        import threading

        self._stop.clear()
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    def __enter__(self) -> "DeviceMonitor":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def summary(self) -> Dict[str, Any]:
        with self._lock:
            samples = list(self._samples)
        if not samples:
            return {"samples": 0}
        in_use = [s.get("bytes_in_use", 0) for s in samples]
        return {
            "samples": len(samples),
            "peak_bytes_in_use": max(in_use),
            "mean_bytes_in_use": int(np.mean(in_use)) if in_use else 0,
            "limit": samples[-1].get("bytes_limit"),
        }


def optimize_batch_size(
    run: Callable[[int], Any],
    initial: int = 1024,
    min_size: int = 1,
    max_tries: int = 8,
) -> int:
    """Find the largest batch size that executes without a memory error
    (reference cuda_utils.py:561 ``optimize_batch_size`` + the OOM
    retry-with-shrink loop :106-143, shrink factor here 1/2)."""
    size = initial
    for _ in range(max_tries):
        if size < min_size:
            break
        try:
            run(size)
            return size
        except Exception as e:  # XLA raises RESOURCE_EXHAUSTED on OOM
            if "RESOURCE_EXHAUSTED" not in str(e) and "out of memory" not in str(e).lower():
                raise
            size //= 2
    return max(size, min_size)


def detect_and_configure() -> Dict[str, Any]:
    """(reference hardware_detector.py:561) -> config fragment for the
    dynamic profile system."""
    det = HardwareDetector()
    info = det.detect()
    from tvc.utils.profiles import select_profile

    profile = select_profile(info)
    return {"hardware": det.summary(), "profile": dataclasses.asdict(profile)}
