"""SCN time travel: snapshot retention (`snapshot_keep`), the
`end_commit_scn` stop position, and `read_lake_asof` — the lake-sink analog
of the reference's checkpoint retention (`keep-checkpoints`,
/root/reference/documentation/user-manual/8.checkpointing.adoc:15-24)."""

from __future__ import annotations

import dataclasses
import glob

import duckdb
import pytest

from olrx.pipelines.replay import ReplayConfig, replay_to_lake
from olrx.pipelines.timetravel import (q_cdc_time_travel, read_lake_asof,
                                       snapshot_watermarks, _split_scn,
                                       sql_cdc_time_travel)

SF = "/root/testdata/sf0.001"


def _cfg(**kw) -> ReplayConfig:
    return dataclasses.replace(ReplayConfig(num_partitions=8), **kw)


def test_time_travel_matches_oracle():
    got = q_cdc_time_travel(SF).to_pandas()
    want = duckdb.sql(sql_cdc_time_travel(SF)).df()
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    assert len(got) == len(want) and list(got.columns) == list(want.columns)
    # per-turn text equality under stable ordering — the north-rule invariant
    assert got["text"].equals(want["text"])
    assert got.equals(want)


def test_snapshot_retention_and_prune_error(gen_small, tmp_path):
    _, _, paths, _ = gen_small
    split = _split_scn(paths)
    lake = str(tmp_path / "lake")

    # snapshot_keep=1 (default): the superseded checkpoint is GC'd and
    # time travel past the prune point must REFUSE, not silently answer new
    replay_to_lake(paths, lake, _cfg(end_commit_scn=split), resume=False)
    replay_to_lake(paths, lake, _cfg(), resume=True)
    per_part = snapshot_watermarks(lake)
    assert all(len(w) == 1 for w in per_part.values())
    with pytest.raises(ValueError, match="pruned"):
        read_lake_asof(lake, split).count()

    # snapshot_keep=2: both checkpoints retained, as-of read works at both
    lake2 = str(tmp_path / "lake2")
    replay_to_lake(paths, lake2, _cfg(end_commit_scn=split, snapshot_keep=2),
                   resume=False)
    r = replay_to_lake(paths, lake2, _cfg(snapshot_keep=2), resume=True)
    wms = sorted({w for ws in snapshot_watermarks(lake2).values() for w in ws})
    assert len(wms) >= 2
    full_now = read_lake_asof(lake2, wms[-1]).count()
    assert full_now == r.stats.to_pandas()["rows"].sum()


def test_asof_data_birth_semantics(gen_small, tmp_path):
    """A lake built by ONE full replay checkpoints only at the end: an as-of
    read at any mid-stream SCN must REFUSE (committed state existed then but
    no snapshot is retained), while an SCN before any data was born is
    legitimately empty (ADVICE r4 #1 — `first_watermark` is checkpoint time,
    not data birth; `first_data_scn` is)."""
    from olrx.state import manifest as MF

    _, _, paths, _ = gen_small
    lake = str(tmp_path / "lake")
    replay_to_lake(paths, lake, _cfg(snapshot_keep=2), resume=False)
    ms = MF.read_all(lake + "/_manifest")
    births = [m.first_data_scn for m in ms.values()]
    assert births and all(b >= 0 for b in births)
    # before ANY partition's data birth: provably empty, not an error
    assert read_lake_asof(lake, min(births) - 1).count() == 0
    # mid-stream, after data existed but before the only checkpoint: refuse
    first_ckpt = min(w for ws in snapshot_watermarks(lake).values() for w in ws)
    assert min(births) < first_ckpt
    with pytest.raises(ValueError, match="pruned or was never checkpointed"):
        read_lake_asof(lake, first_ckpt - 1).count()


def test_end_commit_scn_stops_replay(gen_small, tmp_path):
    import pyarrow.parquet as pq

    _, _, paths, _ = gen_small
    split = _split_scn(paths)
    lake = str(tmp_path / "lake")
    replay_to_lake(paths, lake, _cfg(end_commit_scn=split), resume=False)
    # no snapshot may carry a watermark beyond the stop position
    assert all(w <= split
               for ws in snapshot_watermarks(lake).values() for w in ws)
    # and the state equals the oracle's cut at the split
    files = sorted(glob.glob(lake + "/part-*/data-w*.parquet"))
    import pyarrow as pa
    got = pa.concat_tables([pq.read_table(f) for f in files])
    want = duckdb.sql(sql_cdc_time_travel(SF)).arrow()
    assert got.num_rows == want.num_rows
