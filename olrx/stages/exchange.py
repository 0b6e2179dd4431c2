"""Direct actor exchange — the alternative to the sort-based groupby.

`groupby(part).map_groups` is the Dataset-native exchange but moves every
byte through the object store ~4× (decode out → sort map → sort reduce →
apply input). On bandwidth-contended hardware that halves scaling
efficiency. This module implements SURVEY §4.2's intended design instead:

    decode task ── split batch by applier ──► PartitionApplier actors
                                              (accumulate zero-copy refs)
                                              finalize: merge-apply + commit

One plasma write per decoded batch; appliers read shards zero-copy. Each
`(conv_id, turn_idx)` key lands on exactly one applier (hash partition), the
partitioning assumption merge-apply needs.

Flow control (r2): routing is WINDOWED-async — each router worker keeps up
to ``ACK_WINDOW`` outstanding `add` acks before waiting, so applier-side
work (notably incremental compaction) overlaps routing instead of
serializing behind it. Completion is fenced by COUNT, not by acks: routers
report how many shards they shipped (their map output), and the driver
polls the appliers until the received total matches — only then does
finalize start. Ray Data worker processes outlive their tasks (idle pool),
so submitted-but-unacked actor calls are still delivered; the fence makes
that delivery observable. A retried router block re-ships its shards;
duplicate events are harmless to the LWW merge (same winner) — the fence
counts only COMPLETED router tasks' shards, so the total is exact.

Memory: compaction (``compact_threshold`` rows, ON by default via
ReplayConfig) folds an applier's buffered events to the per-key winner set
(a proven semigroup — tests/test_property.py), keeping applier state
O(#keys) however long the stream is — the TransactionBuffer big-txn swap
analog (/root/reference/src/common/MemoryManager.cpp:197-260).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from olrx.stages.apply import compact_events, merge_apply

#: outstanding un-acked `add` calls per router worker before it waits.
#: Small enough to bound in-flight plasma bytes (window × batch bytes),
#: large enough that applier compaction overlaps routing.
ACK_WINDOW = 8

#: phase wall times of the most recent run_actor_exchange on this driver
#: (bench/diagnostic readout; keys: route, fence, finalize)
LAST_TIMINGS: dict = {}


@ray.remote
class PartitionApplier:
    """Owns `num_partitions / num_appliers` hash partitions; accumulates
    decoded event shards, then merges and (optionally) commits each."""

    def __init__(self, applier_id: int, num_appliers: int,
                 schema_version: int,
                 compact_threshold: int = 0,
                 multi_table: bool = False) -> None:
        self.applier_id = applier_id
        self.num_appliers = num_appliers
        self.schema_version = schema_version
        self.multi_table = multi_table
        self.shards: list[pa.Table] = []
        self.buffered_rows = 0
        self.shards_received = 0
        #: memory guard (0 = off): once buffered events exceed this, fold
        #: them into the per-key winner set (compact_events) — applier state
        #: stays O(#keys) however long the stream is. Runs on the actor's
        #: serial path, overlapped with routing by the ack window.
        self.compact_threshold = compact_threshold
        # all appliers finalize concurrently; each Arrow kernel spawning a
        # full-size internal thread pool oversubscribes the node and inflates
        # even plain numpy wall time via preemption
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)

    def add(self, shard: pa.Table) -> int:
        self.shards_received += 1
        if shard.num_rows:
            self.shards.append(shard)
            self.buffered_rows += shard.num_rows
            if self.compact_threshold and self.buffered_rows >= self.compact_threshold:
                compacted = compact_events(
                    pa.concat_tables(self.shards, promote_options="default"))
                self.shards = [compacted]
                self.buffered_rows = compacted.num_rows
        return shard.num_rows

    def received(self) -> int:
        """Delivery fence: shards that have ARRIVED (mailbox order is
        irrelevant — the driver compares the sum against the routed total)."""
        return self.shards_received

    def finalize_rows(self) -> pa.Table:
        """Merge-apply all owned events; keys are globally unique across
        partitions, so one reduction over the applier's whole holding is
        partition-exact."""
        if not self.shards:
            from olrx import schema as S
            return S.transcripts_schema(
                self.schema_version, include_table=self.multi_table).empty_table()
        all_events = pa.concat_tables(self.shards, promote_options="default")
        self.shards = []
        return merge_apply(all_events, self.schema_version)

    def finalize_commit(self, out_dir: str, safe_watermark: int,
                        max_commit_scn: int, max_txn_span: int) -> pa.Table:
        """Merge-apply + write parquet + manifests for owned partitions."""
        from olrx.pipelines.replay import _apply_and_commit

        stats: list[pa.Table] = []
        if self.shards:
            all_events = pa.concat_tables(self.shards, promote_options="default")
            self.shards = []
            # partition groups via a cheap int sort; per-partition event
            # tables are gathered once (take) and committed independently
            parts = all_events["part"].to_numpy(zero_copy_only=False)
            order = np.argsort(parts, kind="stable")
            parts_sorted = parts[order]
            bounds = np.flatnonzero(np.diff(parts_sorted)) + 1
            for sel in np.split(order, bounds):
                stats.append(_apply_and_commit(
                    all_events.take(pa.array(sel)), out_dir,
                    self.schema_version, safe_watermark, max_commit_scn,
                    max_txn_span))
        if not stats:
            from olrx.pipelines.replay import _stats_row
            return _stats_row(-1, 0, safe_watermark, True, {})[:0]
        return pa.concat_tables(stats)


def make_router(appliers: list, num_appliers: int,
                ack_window: int = ACK_WINDOW):
    """Stateless `map_batches` fn: split each decoded batch by applier id
    (part % A), ship the shards async, and emit a 1-row count batch. Keeps
    at most ``ack_window`` outstanding acks per worker (backpressure without
    serializing behind applier-side compaction)."""
    holder: dict = {}

    def route(batch: pa.Table) -> pa.Table:
        pending: list = holder.setdefault("pending", [])
        sent = 0
        if batch.num_rows:
            part = batch["part"].to_numpy(zero_copy_only=False)
            owner = part % num_appliers
            order = np.argsort(owner, kind="stable")
            sorted_batch = batch.take(pa.array(order))
            owner_sorted = owner[order]
            bounds = np.searchsorted(owner_sorted, np.arange(num_appliers + 1))
            for a in range(num_appliers):
                lo, hi = bounds[a], bounds[a + 1]
                if hi > lo:
                    # Arrow IPC truncates sliced buffers on serialization, so
                    # shipping a slice costs only its own bytes
                    pending.append(appliers[a].add.remote(
                        sorted_batch.slice(lo, hi - lo)))
                    sent += 1
            if len(pending) > ack_window:
                done, rest = ray.wait(pending,
                                      num_returns=len(pending) - ack_window)
                holder["pending"] = rest
        return pa.table({"sent": pa.array([sent], pa.int64())})

    return route


def _fence(appliers: list, sent_total: int, timeout_s: float = 600.0) -> None:
    """Block until every routed shard has arrived at its applier."""
    deadline = time.monotonic() + timeout_s
    while True:
        got = sum(ray.get([a.received.remote() for a in appliers]))
        if got >= sent_total:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"actor exchange fence: {got}/{sent_total} shards delivered")
        time.sleep(0.02)


def run_actor_exchange(events, num_appliers: int, schema_version: int,
                       commit: dict | None = None,
                       compact_threshold: int = 0,
                       as_refs: bool = False,
                       multi_table: bool = False):
    """Drive the routed stream and finalize.

    ``commit=None`` → final transcript rows: a list of per-applier Arrow
    ObjectRefs when ``as_refs`` (feed ``ray.data.from_arrow_refs`` — the
    result never concatenates on the driver), else one concatenated table
    (tests / small inputs only). With ``commit`` kwargs → the stats table
    (small: one row per partition).
    """
    appliers = [PartitionApplier.remote(a, num_appliers, schema_version,
                                        compact_threshold, multi_table)
                for a in range(num_appliers)]
    t0 = time.perf_counter()
    routed = events.map_batches(make_router(appliers, num_appliers),
                                batch_format="pyarrow")
    sent_total = int(routed.sum("sent") or 0)
    t1 = time.perf_counter()
    _fence(appliers, sent_total)
    t2 = time.perf_counter()
    LAST_TIMINGS.clear()
    LAST_TIMINGS.update(route=round(t1 - t0, 3), fence=round(t2 - t1, 3))
    if commit is None:
        refs = [a.finalize_rows.remote() for a in appliers]
        if as_refs:
            # block until the blocks are durably in plasma, then release the
            # actors — the refs stay valid (owned by the driver)
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            for a in appliers:
                ray.kill(a)
            LAST_TIMINGS["finalize"] = round(time.perf_counter() - t2, 3)
            return refs
        outs = ray.get(refs)
    else:
        outs = ray.get([a.finalize_commit.remote(**commit) for a in appliers])
    for a in appliers:
        ray.kill(a)
    LAST_TIMINGS["finalize"] = round(time.perf_counter() - t2, 3)
    return pa.concat_tables([t for t in outs if t.num_rows > 0] or outs[:1])
