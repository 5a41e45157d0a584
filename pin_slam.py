#!/usr/bin/env python3
"""Top-level batch driver, name-compatible with the reference's pin_slam.py
entry point (reference pin_slam.py:31-377):

    python pin_slam.py ./config/lidar_slam/run_demo.yaml [dataset] [seq] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pin_slam_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
