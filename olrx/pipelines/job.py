"""Config-driven replay jobs — the `OpenLogReplicator.json` analog (§2.9).

A job spec is a small JSON document:

    {
      "source": {"paths": ["/logs/*.parquet"],          // or "directory"
                 "expected_shards": [0, 1]},
      "filter": {"skip_xids": ["x10"], "conv_regex": "^conv1",
                 "condition": "op == 'I'", "start_commit_scn": -1},
      "target": {"uri": "/lake/transcripts",
                 "num_partitions": 128, "salt_hot": true},
      "mode":   "batch" | "tail"                        // tail = incremental
    }

``batch``  = ReplicatorBatch (/root/reference/src/replicator/ReplicatorBatch.cpp:30-61):
one shot over an explicit closed file set, confirm to max commit SCN.
``tail``   = offline directory mode (/root/reference/src/replicator/Replicator.cpp:468-557):
re-scan the directory, replay whatever is new past the manifests' watermarks;
safe watermark is min-over-shards. Run it from cron/driver — each invocation
is idempotent.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

from olrx.pipelines.replay import ReplayConfig, ReplayResult, replay_to_lake


def load_job(path_or_dict: "str | dict") -> dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict) as f:
        return json.load(f)


def _resolve_paths(source: dict) -> list[str]:
    if "paths" in source:
        out: list[str] = []
        for p in source["paths"]:
            out.extend(sorted(glob.glob(p)) if any(c in p for c in "*?[") else [p])
        return out
    if "directory" in source:
        return sorted(glob.glob(os.path.join(source["directory"], "*.parquet")))
    raise ValueError("job.source needs 'paths' or 'directory'")


def run_job(spec: "str | dict") -> ReplayResult:
    job = load_job(spec)
    source = job.get("source", {})
    filt = job.get("filter", {})
    target = job.get("target", {})
    mode = job.get("mode", "batch")
    if mode not in ("batch", "tail"):
        raise ValueError(f"unknown mode {mode!r}")

    paths = _resolve_paths(source)
    if not paths:
        raise ValueError("no input segments matched the job source")
    uri = target.get("uri")
    if not uri:
        raise ValueError("job.target.uri is required")

    cfg = ReplayConfig(
        num_partitions=int(target.get("num_partitions", 64)),
        salt_hot=bool(target.get("salt_hot", False)),
        skip_xids=tuple(filt.get("skip_xids", ())),
        conv_regex=filt.get("conv_regex"),
        condition=filt.get("condition"),
        start_commit_scn=int(filt.get("start_commit_scn", -1)),
        assume_complete_input=(mode == "batch"),
        expected_shards=(tuple(source["expected_shards"])
                         if "expected_shards" in source else None),
    )
    return replay_to_lake(paths, uri, cfg, resume=True)


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m olrx.pipelines.job spec.json`` (owns the Ray session)."""
    import sys

    import ray

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m olrx.pipelines.job <job-spec.json>", file=sys.stderr)
        return 2
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        res = run_job(argv[0])
        st = res.stats.to_pandas() if res.stats is not None else None
        summary: dict[str, Any] = {
            "out_dir": res.out_dir,
            "partitions": 0 if st is None else len(st),
            "rows": 0 if st is None else int(st["rows"].sum()),
            "events_applied": 0 if st is None else int(st["events"].sum()),
            "max_commit_scn": res.control.max_commit_scn,
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
