"""Metric accumulation framework.

Equivalent of ``/root/reference/metric/base_metric.py``: metrics accumulate
per-sample results locally; ``all_gather_results`` merges across processes
(torch ``all_gather_object`` -> ``parallel.gather_objects``);
``compute_metrics`` reduces on the primary process.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..parallel import gather_objects


class BaseMetric:
    def __init__(self):
        self.results: List[float] = []

    def process(self, *args, **kwargs):
        raise NotImplementedError

    def all_gather_results(self):
        self.results = gather_objects(self.results)

    def compute_metrics(self) -> float:
        return float(np.mean(np.asarray(self.results, np.float64)))

    def __len__(self):
        return len(self.results)
