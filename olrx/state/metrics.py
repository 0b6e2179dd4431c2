"""Lineage metrics over the lake's commit manifests.

Reference analog: the Prometheus counter surface — bytes/messages/dml_ops/
transactions/checkpoint_lag (/root/reference/src/common/metrics/Metrics.h,
/root/reference/documentation/metrics/metrics.adoc:23-100). Here every apply
task already records its counters into the partition manifest; this module
aggregates them into one report without touching data files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from olrx.state import manifest as MF


@dataclass
class LakeMetrics:
    partitions: int
    rows: int
    watermark_min: int           # confirmed floor (safe resume point)
    watermark_max: int
    schema_version: int
    counters: dict[str, int] = field(default_factory=dict)
    lag_partitions: int = 0      # partitions below the max watermark


def lake_metrics(out_dir: str) -> LakeMetrics:
    ms = MF.read_all(os.path.join(out_dir, "_manifest"))
    if not ms:
        return LakeMetrics(partitions=0, rows=0, watermark_min=-1,
                           watermark_max=-1, schema_version=0)
    counters: dict[str, int] = {}
    for m in ms.values():
        for k, v in (m.counters or {}).items():
            counters[k] = counters.get(k, 0) + int(v)
    wms = [m.watermark_commit_scn for m in ms.values()]
    return LakeMetrics(
        partitions=len(ms),
        rows=sum(m.rows for m in ms.values()),
        watermark_min=min(wms),
        watermark_max=max(wms),
        schema_version=max(m.schema_version for m in ms.values()),
        counters=counters,
        lag_partitions=sum(1 for w in wms if w < max(wms)),
    )
