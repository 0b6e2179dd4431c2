"""Distributed replay vs the naive oracle (dataset mode)."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq

from olrx.gen import GenConfig, ensure_changelog
from olrx.oracle import apply_naive
from olrx.pipelines.replay import ReplayConfig, replay_dataset
from tests.conftest import sorted_table


def _check(cfg: GenConfig, rcfg: ReplayConfig):
    d = ensure_changelog(cfg)
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    got = sorted_table(replay_dataset(paths, rcfg).dataset, exp.schema)
    assert got.equals(exp), "replay != oracle"
    return exp


def test_full_images(gen_small, expected_small):
    _, _, paths, _ = gen_small
    got = sorted_table(replay_dataset(paths, ReplayConfig(num_partitions=16)).dataset,
                       expected_small.schema)
    assert got.equals(expected_small)


def test_partial_images():
    """Changed-column merge semantics (Builder.cpp:1467-1542 analog)."""
    _check(GenConfig(scale=0.001, partial_images=True),
           ReplayConfig(num_partitions=16))


def test_hot_conversation_salted():
    """Skewed hot key + salted repartition stays correct (north rule)."""
    cfg = GenConfig(scale=0.001, hot_conv_factor=200)
    rcfg = ReplayConfig(num_partitions=16, salt_hot=True,
                        hot_frac_threshold=0.02, salt_block=32)
    _check(cfg, rcfg)


def test_hot_key_actually_spreads():
    """The hot conversation must land in >1 partition when salted."""
    import numpy as np
    from olrx.stages.partition import partition_ids

    conv = pa.array(["hot"] * 1000)
    turns = pa.array(np.arange(1000, dtype=np.int32))
    cold = partition_ids(conv, turns, 16)
    hot = partition_ids(conv, turns, 16, hot=frozenset(["hot"]), salt_block=64)
    assert len(set(cold.tolist())) == 1
    assert len(set(hot.tolist())) > 4


def test_no_ddl_narrow_schema():
    """Without DDL the output schema stays at version 0 (no tool_meta)."""
    cfg = GenConfig(scale=0.001, ddl=False)
    d = ensure_changelog(cfg)
    paths = sorted(glob.glob(d + "/*.parquet"))
    res = replay_dataset(paths, ReplayConfig(num_partitions=8))
    got = sorted_table(res.dataset)
    assert "tool_meta" not in got.schema.names
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    exp = apply_naive(full).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.cast(exp.schema).equals(exp)


def test_partial_rollback_drops_only_undone_ops():
    """Savepoint rollback (reference 0x0506): PR-targeted ops vanish, the
    rest of the same txn commits (Transaction.cpp:73-148)."""
    import numpy as np

    cfg = GenConfig(scale=0.001, partial_rollback_frac=0.2)
    d = ensure_changelog(cfg)
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    ops = full["op"].to_pylist()
    assert "PR" in ops, "generator must emit PR records at this frac"
    # every PR names an existing DML op of the same txn
    import pandas as pd
    df = full.select(["xid", "op", "scn", "scn_idx", "undo_scn",
                      "undo_scn_idx"]).to_pandas()
    pr = df[df.op == "PR"]
    dml_keys = set(zip(df[df.op.isin(["I", "U"])]["xid"],
                       df[df.op.isin(["I", "U"])]["scn"],
                       df[df.op.isin(["I", "U"])]["scn_idx"]))
    for r in pr.itertuples():
        assert (r.xid, int(r.undo_scn), int(r.undo_scn_idx)) in dml_keys
    # distributed replay == naive oracle (which drops PR-targeted ops)
    _check(cfg, ReplayConfig(num_partitions=16))
    # and the PR stream is non-trivial: state differs from ignoring PRs
    no_pr = full.filter(pa.compute.invert(
        pa.compute.equal(full["op"], "PR")))
    wrong = apply_naive(no_pr.drop_columns(["undo_scn", "undo_scn_idx"]))
    right = apply_naive(full)
    assert not wrong.equals(right)


def test_multitable_twin_keys_stay_separate(tmp_path):
    """Two-table stream with twin (conv, turn) keys in both tables: replay
    keys state per (table, conv, turn) (Schema.h:119-129 analog), in both
    dataset and lake mode."""
    cfg = GenConfig(scale=0.001, n_tables=2)
    d = ensure_changelog(cfg)
    paths = sorted(glob.glob(d + "/*.parquet"))
    full = pa.concat_tables([pq.read_table(p) for p in paths])
    from olrx.oracle import apply_naive as nv
    exp = nv(full, include_table=True).sort_by(
        [("table_name", "ascending"), ("conv_id", "ascending"),
         ("turn_idx", "ascending")])
    # the stream really contains twin keys (same conv/turn, two tables)
    import pandas as pd
    kdf = exp.select(["table_name", "conv_id", "turn_idx"]).to_pandas()
    dupes = kdf.duplicated(subset=["conv_id", "turn_idx"], keep=False)
    assert dupes.any(), "generator must plant twin keys across tables"
    rcfg = ReplayConfig(num_partitions=16, multi_table=True)
    got = sorted_table(replay_dataset(paths, rcfg).dataset, exp.schema)
    assert got.equals(exp)
    # lake mode round-trip
    from olrx.pipelines.replay import read_lake, replay_to_lake
    out = str(tmp_path / "mt_lake")
    replay_to_lake(paths, out, rcfg, resume=False)
    lk = sorted_table(read_lake(out), exp.schema)
    assert lk.equals(exp)
    # table filter: only t0 rows
    fcfg = ReplayConfig(num_partitions=16, multi_table=True, table_regex="^t0$")
    got0 = replay_dataset(paths, fcfg).dataset.to_pandas()
    assert set(got0["table_name"]) == {"t0"}


def test_start_time_rel_matches_absolute(gen_small):
    """start-time-rel resolves to head-ts − rel and then behaves exactly like
    the absolute start-time position (reference start-time-rel,
    OpenLogReplicator.cpp:533-558)."""
    from olrx.pipelines.replay import resolve_start_time_rel

    _, _, paths, _ = gen_small
    head_us = resolve_start_time_rel(paths, 0)
    rel = 3_600_000_000  # last hour of the stream
    rcfg_rel = ReplayConfig(num_partitions=8, start_time_rel_us=rel)
    rcfg_abs = ReplayConfig(num_partitions=8, start_time_us=head_us - rel)
    got_rel = sorted_table(replay_dataset(paths, rcfg_rel).dataset)
    got_abs = sorted_table(replay_dataset(paths, rcfg_abs).dataset)
    assert got_rel.equals(got_abs)
    # a window covering the whole stream reduces to the full replay
    full_win = ReplayConfig(num_partitions=8,
                            start_time_rel_us=10**15)
    got_all = sorted_table(replay_dataset(paths, full_win).dataset)
    got_plain = sorted_table(
        replay_dataset(paths, ReplayConfig(num_partitions=8)).dataset)
    assert got_all.equals(got_plain)
