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

Flow control (r2.1): appliers are METADATA BROKERS. Routers ``ray.put``
each shard (owner = the receiving applier, so refs outlive the router
worker) and send only the ObjectRef — `add_ref` appends a ref and returns,
so acks are instant and a busy applier can never convoy the routers (the
r2.0 design ran compaction on the actor's serial message path; one
compacting applier filled every router's ack window and stalled the whole
exchange — measured 4× wall blowup at 4 CPUs). Completion is fenced by
COUNT, not by acks: routers report how many shards they shipped (their map
output), and the driver polls the appliers until the received total
matches — only then does finalize start. A retried router block re-ships
its shards; duplicate events are harmless to the LWW merge (same winner) —
the fence counts only COMPLETED router tasks' shards, so the total is
exact.

Memory: compaction (``compact_threshold`` rows, ON by default via
ReplayConfig) folds buffered events to the per-key winner set (a proven
semigroup — tests/test_property.py). It runs as detached Ray TASKS over
the buffered refs — off the actor's message path, scheduled onto whatever
CPUs are idle — and the raw shards live in the object store (which spills
to disk under pressure), not the actor heap. Applier-visible state is
O(#runs) refs; materialized bytes are bounded by plasma + the compacted
winner sets — the TransactionBuffer big-txn swap analog
(/root/reference/src/common/MemoryManager.cpp:197-260).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from olrx.stages.apply import compact_events, merge_apply

#: outstanding un-acked `add_ref` calls per router worker before it waits.
#: Acks are instant (ref append), so the window only bounds the actor
#: mailbox depth, not throughput.
ACK_WINDOW = 32

#: phase wall times of the most recent run_actor_exchange on this driver
#: (bench/diagnostic readout; keys: route, fence, finalize)
LAST_TIMINGS: dict = {}


def _op_counts(t: pa.Table) -> np.ndarray:
    """Pre-compaction lineage counts: flat array of (part*4 + op_code) keys,
    one per event — callers np.unique them. Kept as raw keys so partial
    counts merge by concatenation."""
    part = t["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    op = t["op_code"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = part * 4 + op
    uniq, cnt = np.unique(key, return_counts=True)
    return np.stack([uniq, cnt])


@ray.remote(num_cpus=1)
def _compact_run(refs: list) -> dict:
    """Off-path compaction: fold a batch of buffered shard refs into their
    per-key winner set. Runs as a plain task on whatever CPU is idle; the
    applier's message loop never blocks on it. Also returns the
    PRE-compaction per-(partition, op) counts — compaction folds events
    away, but the lineage counters (reference dml_ops metrics,
    /root/reference/src/common/metrics/Metrics.h) must count the stream."""
    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)
    tables = []
    counts = []
    for obj in ray.get(refs):
        if isinstance(obj, dict):   # a previous run folded into this one
            tables.append(obj["table"])
            counts.append(obj["counts"])
        else:
            tables.append(obj)
            counts.append(_op_counts(obj))
    merged = np.concatenate(counts, axis=1)
    uniq, inv = np.unique(merged[0], return_inverse=True)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(cnt, inv, merged[1])
    return {
        "table": compact_events(
            pa.concat_tables(tables, promote_options="default")),
        "counts": np.stack([uniq, cnt]),
    }


@ray.remote
class PartitionApplier:
    """Owns `num_partitions / num_appliers` hash partitions; collects
    decoded event shard REFS, then merges and (optionally) commits each.
    Bulk bytes stay in the object store until finalize."""

    def __init__(self, applier_id: int, num_appliers: int,
                 schema_version: int,
                 compact_threshold: int = 0,
                 multi_table: bool = False) -> None:
        self.applier_id = applier_id
        self.num_appliers = num_appliers
        self.schema_version = schema_version
        self.multi_table = multi_table
        self.shard_refs: list = []       # un-compacted shard ObjectRefs
        self.runs: list = []             # refs of compacted runs (task outputs)
        self.buffered_rows = 0
        self.shards_received = 0
        #: memory guard (0 = off): once buffered (un-compacted) events exceed
        #: ``max(threshold, rows already folded)``, hand the buffer to an
        #: off-path compaction task chained onto the previous run. The
        #: geometric trigger (fold sizes double) keeps total compaction work
        #: O(R) — a fixed re-fold threshold is quadratic in stream length.
        #: Staggered ±25% by applier id so the fleet doesn't trigger in
        #: lockstep (a synchronized storm steals every CPU at once).
        self.compact_threshold = compact_threshold
        if compact_threshold:
            frac = applier_id / max(1, num_appliers - 1) if num_appliers > 1 else 0.5
            self.compact_threshold = int(compact_threshold * (0.75 + 0.5 * frac))
        self.folded_rows = 0     # upper bound of the compacted run's rows
        # all appliers finalize concurrently; each Arrow kernel spawning a
        # full-size internal thread pool oversubscribes the node and inflates
        # even plain numpy wall time via preemption
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)

    def add_ref(self, shard_ref_box: list, num_rows: int) -> int:
        """Register one shard. O(1): the payload stays in plasma; compaction
        (if due) is dispatched as a task, not run here. The ref arrives
        boxed in a 1-list — a bare ObjectRef argument would be auto-resolved
        by Ray into the materialized table."""
        self.shards_received += 1
        if num_rows:
            self.shard_refs.append(shard_ref_box[0])
            self.buffered_rows += num_rows
            if self.compact_threshold and self.buffered_rows >= max(
                    self.compact_threshold, self.folded_rows):
                # fold buffer + previous run into one new run (tasks chain via
                # the run ref; serial per applier, parallel across the fleet)
                self.runs = [_compact_run.remote(self.runs + self.shard_refs)]
                self.folded_rows += self.buffered_rows
                self.shard_refs = []
                self.buffered_rows = 0
        return num_rows

    def received(self) -> int:
        """Delivery fence: shards that have ARRIVED (mailbox order is
        irrelevant — the driver compares the sum against the routed total)."""
        return self.shards_received

    def _gather(self) -> "tuple[pa.Table, np.ndarray] | None":
        """Materialize this applier's holding: compacted runs (waits for any
        in-flight compaction tasks) + the un-compacted tail. Returns the
        events plus exact pre-compaction (part, op) stream counts."""
        refs = self.runs + self.shard_refs
        self.runs, self.shard_refs = [], []
        self.buffered_rows = 0
        self.folded_rows = 0
        if not refs:
            return None
        tables = []
        counts = [np.zeros((2, 0), np.int64)]
        for obj in ray.get(refs):
            if isinstance(obj, dict):
                if obj["table"].num_rows:
                    tables.append(obj["table"])
                counts.append(obj["counts"])
            elif obj.num_rows:
                tables.append(obj)
                counts.append(_op_counts(obj))
        if not tables:
            return None
        merged = np.concatenate(counts, axis=1)
        uniq, inv = np.unique(merged[0], return_inverse=True)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, inv, merged[1])
        return (pa.concat_tables(tables, promote_options="default"),
                np.stack([uniq, cnt]))

    def finalize_rows(self) -> pa.Table:
        """Merge-apply all owned events; keys are globally unique across
        partitions, so one reduction over the applier's whole holding is
        partition-exact."""
        held = self._gather()
        if held is None:
            from olrx import schema as S
            return S.transcripts_schema(
                self.schema_version, include_table=self.multi_table).empty_table()
        return merge_apply(held[0], self.schema_version)

    def finalize_commit(self, out_dir: str, safe_watermark: int,
                        max_commit_scn: int, max_txn_span: int) -> pa.Table:
        """Merge-apply + write parquet + manifests for owned partitions."""
        from olrx.pipelines.replay import _apply_and_commit

        stats: list[pa.Table] = []
        held = self._gather()
        if held is not None:
            all_events, op_counts = held
            # partition groups via a cheap int sort; per-partition event
            # tables are gathered once (take) and committed independently
            parts = all_events["part"].to_numpy(zero_copy_only=False)
            order = np.argsort(parts, kind="stable")
            parts_sorted = parts[order]
            bounds = np.flatnonzero(np.diff(parts_sorted)) + 1
            for sel in np.split(order, bounds):
                part_id = int(parts[sel[0]])
                m = (op_counts[0] // 4) == part_id
                ops = op_counts[0][m] % 4
                cnt = op_counts[1][m]
                counters = {"events": int(cnt.sum())}
                for code, nm in ((0, "inserts"), (1, "updates"), (2, "deletes")):
                    counters[nm] = int(cnt[ops == code].sum())
                stats.append(_apply_and_commit(
                    all_events.take(pa.array(sel)), out_dir,
                    self.schema_version, safe_watermark, max_commit_scn,
                    max_txn_span, counters=counters))
        if not stats:
            from olrx.pipelines.replay import _stats_row
            return _stats_row(-1, 0, safe_watermark, True, {})[:0]
        return pa.concat_tables(stats)


def make_router(appliers: list, num_appliers: int,
                ack_window: int = ACK_WINDOW, ready_refs: list | None = None):
    """Stateless `map_batches` fn: split each decoded batch by applier id
    (part % A), `ray.put` each shard (owned by its applier, so the ref
    outlives this worker), ship the REF async, and emit a 1-row count batch.
    Keeps at most ``ack_window`` outstanding acks per worker (bounds the
    actor mailbox; acks are instant so this never throttles throughput)."""
    holder: dict = {}

    def route(batch: pa.Table) -> pa.Table:
        if ready_refs is not None and not holder.get("ready"):
            # ray.put(_owner=applier) needs live owners; actor spawn overlaps
            # with the read+decode of the first blocks, so this wait is short
            ray.get(ready_refs)
            holder["ready"] = True
        pending: list = holder.setdefault("pending", [])
        sent = 0
        if batch.num_rows:
            part = batch["part"].to_numpy(zero_copy_only=False)
            owner = part % num_appliers
            if np.all(owner[1:] >= owner[:-1]):
                # decode emitted owner-sorted rows (owner_sort): slice only —
                # no router-side gather of the payload bytes
                sorted_batch = batch
                owner_sorted = owner
            else:
                order = np.argsort(owner, kind="stable")
                sorted_batch = batch.take(pa.array(order))
                owner_sorted = owner[order]
            bounds = np.searchsorted(owner_sorted, np.arange(num_appliers + 1))
            for a in range(num_appliers):
                lo, hi = bounds[a], bounds[a + 1]
                if hi > lo:
                    # Arrow IPC truncates sliced buffers on serialization, so
                    # the put costs only the shard's own bytes. _owner pins
                    # the ref to the applier: router workers are pooled task
                    # processes Ray may reap before finalize reads the ref.
                    shard = sorted_batch.slice(lo, hi - lo)
                    ref = ray.put(shard, _owner=appliers[a])
                    # boxed: a bare ref arg would be auto-resolved to the table
                    pending.append(appliers[a].add_ref.remote([ref], hi - lo))
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
    # routers ray.put with _owner=applier, which needs the owner's address —
    # an actor still pending creation has none ("worker_id is empty"). The
    # readiness refs are waited on lazily inside the first route() call per
    # worker, so actor spawn overlaps the read+decode of the first blocks.
    ready_refs = [a.__ray_ready__.remote() for a in appliers]
    t0 = time.perf_counter()
    routed = events.map_batches(make_router(appliers, num_appliers,
                                            ready_refs=ready_refs),
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
