"""Round-3 surfaces: tail-mode live config reload, control-summary
checkpoint pruning + safe (non-pickle) serialization, retry-deduped
exchange shards, and resume-exact lineage counters."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray

from olrx.pipelines.replay import ReplayConfig, read_lake, replay_to_lake
from olrx.state import manifest as MF
from tests.conftest import sorted_table

CFG = ReplayConfig(num_partitions=16)


# ---------------------------------------------------------------------------
# tail-mode live config reload (reference Checkpoint.cpp:59-271)
# ---------------------------------------------------------------------------

def test_tail_config_live_reload(tmp_path, gen_small):
    """Editing the job spec between tail iterations must take effect at the
    next iteration without a job restart, and manifests stay consistent."""
    from olrx.pipelines.job import TailSession

    _, _, paths, _ = gen_small
    src = tmp_path / "segments"
    src.mkdir()
    lake = str(tmp_path / "lake")
    spec_path = str(tmp_path / "job.json")
    spec = {"source": {"directory": str(src)},
            "target": {"uri": lake, "num_partitions": 16},
            "mode": "tail"}
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    first = [p for p in paths if "seg0000" in p or "seg0001" in p]
    for p in first:
        shutil.copy(p, src / os.path.basename(p))

    sess = TailSession(spec_path)
    sess.run_once()
    assert sess.reloads == 1
    t1 = sorted_table(read_lake(lake))
    assert t1.num_rows > 0

    # config edit mid-tail: track nothing; new segments arrive
    spec["filter"] = {"conv_regex": "^no-conversation-matches-this$"}
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    st = os.stat(spec_path)
    os.utime(spec_path, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    for p in paths:
        if p not in first:
            shutil.copy(p, src / os.path.basename(p))

    sess.run_once()
    assert sess.reloads == 2, "mtime change must trigger a config rebuild"
    assert sess.cfg.conv_regex == "^no-conversation-matches-this$"
    t2 = sorted_table(read_lake(lake))
    # the new segments' events were all dropped by the NEW filter
    assert t2.equals(t1)
    # manifests stayed readable and consistent
    ms = MF.read_all(os.path.join(lake, "_manifest"))
    assert all(m.rows >= 0 for m in ms.values())


def test_tail_session_rejects_batch_spec(tmp_path):
    from olrx.pipelines.job import TailSession

    spec_path = str(tmp_path / "job.json")
    with open(spec_path, "w") as f:
        json.dump({"source": {"directory": "/x"}, "target": {"uri": "/y"},
                   "mode": "batch"}, f)
    with pytest.raises(ValueError, match="mode='tail'"):
        TailSession(spec_path)


# ---------------------------------------------------------------------------
# control-summary checkpoints: pruning + non-executable serialization
# ---------------------------------------------------------------------------

def _copied_changelog(tmp_path, gen_small):
    _, d, paths, _ = gen_small
    dst = tmp_path / "log"
    shutil.copytree(d, dst)
    return sorted(glob.glob(str(dst / "*.parquet")))


def test_summary_checkpoint_pruning(tmp_path, gen_small):
    """A long tail sequence (new file-set digest per iteration) must leave
    at most KEEP_SUMMARIES checkpoint files (reference keep-checkpoints,
    Metadata.cpp:619-674)."""
    from olrx.stages.decode import KEEP_SUMMARIES, load_control

    paths = _copied_changelog(tmp_path, gen_small)
    assert len(paths) > KEEP_SUMMARIES + 1
    for i in range(1, len(paths) + 1):
        load_control(paths[:i])
    ctl_dir = os.path.join(os.path.dirname(paths[0]), "_ctl")
    summaries = [f for f in os.listdir(ctl_dir) if f.startswith("_summary-")]
    assert 1 <= len(summaries) <= KEEP_SUMMARIES


def test_control_summary_roundtrip(tmp_path, gen_small):
    """The Arrow-IPC checkpoint (non-executable — r2 advisory replaced
    pickle) must reload byte-equal control state, including the precomputed
    lookup arrays and PR anti-join keys."""
    from olrx.stages.decode import load_control

    paths = _copied_changelog(tmp_path, gen_small)
    fresh = load_control(paths)          # computes + writes the checkpoint
    cached = load_control(paths)         # loads the checkpoint
    assert cached.max_commit_scn == fresh.max_commit_scn
    assert cached.shard_watermarks == fresh.shard_watermarks
    assert cached.ddl_scns == fresh.ddl_scns
    assert cached.max_txn_span == fresh.max_txn_span
    assert cached.commit_map.sort_by("xid").equals(fresh.commit_map.sort_by("xid"))
    np.testing.assert_array_equal(cached.pr_sorted, fresh.pr_sorted)
    l0f, l1f = fresh.commit_lookup_arrays()
    l0c, l1c = cached.commit_lookup_arrays()
    np.testing.assert_array_equal(l0c, l0f)
    np.testing.assert_array_equal(l1c, l1f)
    # and no pickle anywhere near the checkpoint
    ctl_dir = os.path.join(os.path.dirname(paths[0]), "_ctl")
    assert not [f for f in os.listdir(ctl_dir) if f.endswith(".pkl")]


# ---------------------------------------------------------------------------
# exchange: retried router blocks must not inflate state or counters
# ---------------------------------------------------------------------------

def test_exchange_retry_dedupe(tmp_path, gen_small):
    """A retried router block re-ships identical rows under a fresh blob id;
    the applier must drop the duplicate by content digest: merged rows AND
    lineage counters equal the single-delivery run."""
    from olrx.stages.decode import load_control
    from olrx.pipelines.replay import _decoded_events
    from olrx.stages.exchange import PartitionApplier, make_router

    _, _, paths, _ = gen_small
    control = load_control(paths)
    cfg = ReplayConfig(num_partitions=8)
    batch = _decoded_events(paths, cfg, control).take_batch(
        4000, batch_format="pyarrow")
    sv = control.schema_version

    def run(n_deliveries: int) -> pa.Table:
        appliers = [PartitionApplier.remote(0, 1, sv, 0, False)]
        ray.get([a.__ray_ready__.remote() for a in appliers])
        for _ in range(n_deliveries):
            # a fresh router per delivery = a retried task's fresh blob-id
            # space; the shard CONTENT digests are identical
            make_router(appliers, 1, codec="zstd")(batch)
        # poll like the real fence until the mailbox drains the shards
        import time as _time
        deadline = _time.monotonic() + 30
        while ray.get(appliers[0].received.remote()) < n_deliveries:
            assert _time.monotonic() < deadline, "shards never drained"
            _time.sleep(0.02)
        out = str(tmp_path / f"lake-{n_deliveries}")
        stats = ray.get(appliers[0].finalize_commit.remote(
            out_dir=out, safe_watermark=control.max_commit_scn,
            max_commit_scn=control.max_commit_scn, max_txn_span=0))
        ray.kill(appliers[0])
        return stats

    once = run(1).sort_by("partition")
    twice = run(2).sort_by("partition")
    assert twice.equals(once), \
        "duplicate delivery changed rows or lineage counters"
    assert int(pa.compute.sum(once["events"]).as_py()) == batch.num_rows


# ---------------------------------------------------------------------------
# resume-exact lineage counters (r2 advisory: watermark-filtered recount)
# ---------------------------------------------------------------------------

def _counters_by_part(out: str) -> dict[int, int]:
    return {p: m.counters.get("events", 0)
            for p, m in MF.read_all(os.path.join(out, "_manifest")).items()}


def test_counters_stream_exact_on_resume(tmp_path, gen_small, expected_small):
    """Heterogeneous resume (some partitions confirmed, some lost): the
    healing run's counters must be STREAM counts of exactly the events each
    partition newly applies — full history for lost partitions, only
    post-watermark events for surviving ones — not folded winner counts."""
    _, _, paths, _ = gen_small
    first = [p for p in paths if "seg0000" in p or "seg0001" in p]

    full_lake = str(tmp_path / "full")
    replay_to_lake(paths, full_lake, CFG)
    c_full = _counters_by_part(full_lake)

    out = str(tmp_path / "healing")
    replay_to_lake(first, out, CFG)
    c_first = _counters_by_part(out)

    # lose a few manifests (plus the lake-level watermark, as a crash before
    # the lake write leaves it) → those partitions recover from scratch while
    # the survivors' watermarks stay ahead of the global resume floor
    mdir = os.path.join(out, "_manifest")
    victims = {int(f.split("-")[1].split(".")[0])
               for f in sorted(os.listdir(mdir))[:5] if f.startswith("part-")}
    for p in victims:
        os.remove(os.path.join(mdir, f"part-{p:05d}.json"))
    os.remove(os.path.join(mdir, "_lake.json"))

    replay_to_lake(paths, out, CFG)
    c_heal = _counters_by_part(out)

    for p, full_n in c_full.items():
        if p in victims or p not in c_first:
            assert c_heal[p] == full_n, f"lost partition {p} must recount all"
        else:
            assert c_heal[p] == full_n - c_first[p], \
                f"survivor {p}: counters must be stream-exact above its watermark"
    # and the healed lake still matches the oracle
    assert sorted_table(read_lake(out), expected_small.schema).equals(expected_small)


def test_fold_materialize_path(tmp_path, gen_small, expected_small):
    """Force constant off-path folds (tiny compact threshold): winner
    materialization + blob release during routing must produce the same
    lake as the no-fold path, including across a resume."""
    _, _, paths, _ = gen_small
    cfg = ReplayConfig(num_partitions=16, applier_compact_threshold=50)
    out = str(tmp_path / "lake")
    first = [p for p in paths if "seg0000" in p or "seg0001" in p]
    replay_to_lake(first, out, cfg)
    replay_to_lake(paths, out, cfg)
    got = sorted_table(read_lake(out), expected_small.schema)
    assert got.equals(expected_small)
    # lineage counters survive the fold path (winner counts would be lower)
    ms = MF.read_all(os.path.join(out, "_manifest"))
    assert sum(m.counters.get("events", 0) for m in ms.values()) > 0


# ---------------------------------------------------------------------------
# live metrics surface (reference MetricsPrometheus.cpp analog)
# ---------------------------------------------------------------------------

def test_tail_live_metrics_surface(tmp_path, gen_small):
    """Counters advance across tail iterations, match the manifest totals,
    and both live surfaces (JSON snapshot file + HTTP /metrics endpoint)
    serve them while the session runs."""
    import urllib.request

    from olrx.pipelines.job import TailSession
    from olrx.state.metrics import lake_metrics

    _, _, paths, _ = gen_small
    src = tmp_path / "segments"
    src.mkdir()
    lake = str(tmp_path / "lake")
    spec_path = str(tmp_path / "job.json")
    with open(spec_path, "w") as f:
        json.dump({"source": {"directory": str(src)},
                   "target": {"uri": lake, "num_partitions": 16},
                   "mode": "tail"}, f)

    first = [p for p in paths if "seg0000" in p or "seg0001" in p]
    for p in first:
        shutil.copy(p, src / os.path.basename(p))

    sess = TailSession(spec_path, metrics_port=0)
    try:
        sess.run_once()
        snap1 = sess.metrics.snapshot()
        assert snap1["counters"]["olrx_iterations_total"] == 1
        ev1 = snap1["counters"]["olrx_events_applied_total"]
        assert ev1 > 0
        # fresh lake: live counters equal the manifest totals exactly (two
        # independent paths — stats rows folded on the driver vs counters
        # the appliers wrote into manifests)
        m1 = lake_metrics(lake)
        assert ev1 == m1.counters["events"]
        for op, nm in (("insert", "inserts"), ("update", "updates"),
                       ("delete", "deletes")):
            assert (snap1["counters"][f'olrx_dml_ops_total{{op="{op}"}}']
                    == m1.counters[nm]), nm

        wm1 = {p: m.watermark_commit_scn
               for p, m in MF.read_all(os.path.join(lake, "_manifest")).items()}

        # second iteration: the rest of the stream arrives
        for p in paths:
            if p not in first:
                shutil.copy(p, src / os.path.basename(p))
        sess.run_once()
        snap2 = sess.metrics.snapshot()
        assert snap2["counters"]["olrx_iterations_total"] == 2
        ev2 = snap2["counters"]["olrx_events_applied_total"]
        assert ev2 > ev1, "counters must advance across iterations"
        # iteration-2 delta == the manifest deltas of the partitions that
        # advanced (manifest counters are per-run stream counts; untouched
        # partitions keep their iteration-1 manifests)
        ms2 = MF.read_all(os.path.join(lake, "_manifest"))
        delta2 = sum(m.counters.get("events", 0) for p, m in ms2.items()
                     if m.watermark_commit_scn > wm1.get(p, -1))
        assert ev2 - ev1 == delta2
        m = lake_metrics(lake)
        assert snap2["gauges"]["olrx_lake_rows"] == m.rows
        assert snap2["gauges"]["olrx_checkpoint_lag"] == \
            m.watermark_max - m.watermark_min

        # JSON snapshot file written next to the manifests
        live = json.load(open(os.path.join(lake, "_metrics", "live.json")))
        assert live["counters"]["olrx_events_applied_total"] == ev2

        # HTTP endpoint serves Prometheus text + JSON live
        base = f"http://127.0.0.1:{sess.metrics_server.port}"
        prom = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert f"olrx_events_applied_total {ev2}" in prom
        via_http = json.loads(
            urllib.request.urlopen(f"{base}/metrics.json").read())
        assert via_http["counters"]["olrx_iterations_total"] == 2
    finally:
        sess.close()
