"""Dynamic hardware-derived config profiles — TPU topology edition.

Covers reference src/utils/dynamic_config.py (DynamicConfigManager :32,
profiles :44-130: high_performance 6+x24GB / medium / standard / basic /
cpu, auto_configure_system :561, writes configs/dynamic/auto_generated_
config.yaml). GPU-count tiers become TPU-topology tiers (SURVEY.md §5.6):
v5e-8 / v5e-4 / single-chip / CPU.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

from tvc.utils.hardware import HardwareDetector, SystemInfo


@dataclasses.dataclass
class DynamicConfigProfile:
    """(reference dynamic_config.py:23-31)"""

    name: str
    description: str
    batch_size: int
    bank_shards: int
    num_text_variants: int
    sd_images_per_prompt: int
    mesh_axes: tuple
    mesh_shape: tuple
    precision: str


PROFILES: Dict[str, DynamicConfigProfile] = {
    "tpu_pod_slice": DynamicConfigProfile(
        name="tpu_pod_slice",
        description="8+ TPU chips (e.g. v5e-8): full SPMD, sharded bank",
        batch_size=2048,
        bank_shards=8,
        num_text_variants=8,
        sd_images_per_prompt=3,
        mesh_axes=("data", "model"),
        mesh_shape=(-1, 2),
        precision="bfloat16",
    ),
    "tpu_multi_chip": DynamicConfigProfile(
        name="tpu_multi_chip",
        description="2-7 TPU chips: data-parallel, replicated bank",
        batch_size=1024,
        bank_shards=2,
        num_text_variants=6,
        sd_images_per_prompt=3,
        mesh_axes=("data",),
        mesh_shape=(-1,),
        precision="bfloat16",
    ),
    "tpu_single_chip": DynamicConfigProfile(
        name="tpu_single_chip",
        description="one TPU chip: batched single-device execution",
        batch_size=256,
        bank_shards=1,
        num_text_variants=5,
        sd_images_per_prompt=2,
        mesh_axes=("data",),
        mesh_shape=(1,),
        precision="bfloat16",
    ),
    "cpu": DynamicConfigProfile(
        name="cpu",
        description="no accelerator: reduced workload (tests/dev)",
        batch_size=32,
        bank_shards=1,
        num_text_variants=3,
        sd_images_per_prompt=1,
        mesh_axes=("data",),
        mesh_shape=(1,),
        precision="float32",
    ),
}


def select_profile(info: Optional[SystemInfo] = None) -> DynamicConfigProfile:
    """(reference dynamic_config.py:131-210 tier selection)"""
    if info is None:
        info = HardwareDetector().detect()
    if info.platform != "tpu":
        return PROFILES["cpu"]
    if info.num_devices >= 8:
        return PROFILES["tpu_pod_slice"]
    if info.num_devices >= 2:
        return PROFILES["tpu_multi_chip"]
    return PROFILES["tpu_single_chip"]


class DynamicConfigManager:
    """(reference dynamic_config.py:32)"""

    def __init__(self, config_dir: Optional[str] = None):
        if config_dir is None:
            config_dir = str(Path(__file__).resolve().parents[2] / "configs")
        self.config_dir = Path(config_dir)
        self.detector = HardwareDetector()

    def auto_configure_system(
        self, write: bool = True, profile: Optional[str] = None
    ) -> Dict[str, Any]:
        """(reference :561) — selects a profile (or uses the named one,
        reference deploy.py --profile) and optionally writes
        configs/dynamic/auto_generated_config.yaml."""
        info = self.detector.detect()
        if profile is not None:
            if profile not in PROFILES:
                raise ValueError(
                    f"unknown profile {profile!r}; available: {sorted(PROFILES)}"
                )
            profile = PROFILES[profile]
        else:
            profile = select_profile(info)
        config = {
            "generated_by": "tvc.utils.profiles.DynamicConfigManager",
            "hardware": self.detector.summary(),
            "profile": profile.name,
            "batch": {"default_size": profile.batch_size},
            "device": {
                "platform": info.platform,
                "precision": profile.precision,
                "mesh": {
                    "axes": list(profile.mesh_axes),
                    "shape": list(profile.mesh_shape),
                },
            },
            "defense": {
                "text_variants": {"num_variants": profile.num_text_variants},
                "sd_reference": {"num_images": profile.sd_images_per_prompt},
            },
        }
        if write:
            out = self.config_dir / "dynamic" / "auto_generated_config.yaml"
            out.parent.mkdir(parents=True, exist_ok=True)
            import yaml

            out.write_text(yaml.safe_dump(config, sort_keys=False))
        return config
