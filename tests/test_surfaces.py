"""Validation stage, metrics report, message-stream emitter, job specs."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from olrx.pipelines.replay import ReplayConfig, replay_to_lake
from olrx.stages.validate import SegmentValidator, validate_segments
from olrx.state.metrics import lake_metrics


def test_validate_clean_segments(gen_small):
    _, _, paths, full = gen_small
    out = validate_segments(paths, strict=True)
    assert out["rows_ok"] == full.num_rows


def test_validate_catches_corruption(gen_small):
    _, _, paths, _ = gen_small
    t = pq.read_table(paths[0])
    # corrupt: null out conv_id on DML rows
    import pyarrow.compute as pc
    conv = pc.if_else(pc.equal(t["op"], "I"),
                      pa.nulls(t.num_rows, pa.string()), t["conv_id"])
    bad = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", conv)
    v = SegmentValidator(strict=True)
    with pytest.raises(ValueError, match="null row key"):
        v(bad)
    # permissive mode drops the bad rows instead
    cleaned = SegmentValidator(strict=False)(bad)
    n_bad = pc.sum(pc.equal(bad["op"], "I")).as_py()
    assert cleaned.num_rows == bad.num_rows - n_bad


def test_lake_metrics(tmp_path, gen_small):
    _, _, paths, _ = gen_small
    out = str(tmp_path / "lake")
    replay_to_lake(paths, out, ReplayConfig(num_partitions=16))
    m = lake_metrics(out)
    assert m.partitions == 16
    assert m.rows > 0
    assert m.watermark_min == m.watermark_max  # batch mode: all confirmed equal
    assert m.counters["events"] > 0
    assert m.lag_partitions == 0


def test_message_stream_order_and_shape(gen_small):
    from olrx.pipelines.emit import message_stream

    _, _, paths, _ = gen_small
    df = message_stream(paths, ReplayConfig(num_partitions=8),
                        scn_buckets=8).to_pandas()
    assert len(df) > 0
    # within each bucket the stream is commit-ordered
    for _, g in df.groupby("scn_bucket"):
        key = list(zip(g["c_scn"], g["scn"], g["c_idx"]))
        assert key == sorted(key)
    msg = json.loads(df.iloc[0]["msg"])
    assert {"c_scn", "scn", "c_idx", "payload"} <= set(msg)
    assert msg["payload"][0]["op"] in ("i", "u", "d")
    assert "after" in msg["payload"][0]


def test_job_spec_validation(tmp_path):
    from olrx.pipelines.job import run_job

    with pytest.raises(ValueError, match="source"):
        run_job({"target": {"uri": str(tmp_path)}})
    with pytest.raises(ValueError, match="unknown mode"):
        run_job({"source": {"paths": ["/x"]},
                 "target": {"uri": str(tmp_path)}, "mode": "stream"})
    with pytest.raises(ValueError, match="target.uri"):
        run_job({"source": {"paths": [__file__]}, "target": {}})
