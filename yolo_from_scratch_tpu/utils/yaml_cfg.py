"""dataset.yaml loader — byte-compatible with the reference format
(reference: train.py:1392-1395; README.md:59-65): keys `nc`, `names`,
`train`, `val`."""

from __future__ import annotations

import yaml


def load_dataset_yaml(path) -> dict:
    with open(path, encoding="utf-8") as f:
        config = yaml.safe_load(f)
    return config
