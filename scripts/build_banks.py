#!/usr/bin/env python
"""Prebuild CLIP embedding banks for a dataset.

(replaces reference scripts/build_faiss_indices.py — flat/IVF/HNSW/PQ index
types collapse into the exact sharded matmul bank, SURVEY.md §2.3)

Usage: python scripts/build_banks.py --dataset coco --data-dir ./data \
           --output ./data/banks/coco
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tvc.cli import build_bank_main

if __name__ == "__main__":
    build_bank_main()
