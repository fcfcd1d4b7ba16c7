#!/usr/bin/env python
"""Entry-point shim preserving the reference's `python train.py …` contract
(reference: train.py:1354-1565). All logic lives in
yolo_from_scratch_tpu/cli.py."""

from yolo_from_scratch_tpu.cli import main

if __name__ == "__main__":
    main()
