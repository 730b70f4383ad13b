#!/usr/bin/env python
"""Hardware-detect + auto-configure + smoke-run deployment.

(reference scripts/deploy.py:315)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tvc.cli import deploy_main

if __name__ == "__main__":
    deploy_main()
