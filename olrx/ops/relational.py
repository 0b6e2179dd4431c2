"""Relational operators Ray Data lacks natively: an event-time AS-OF join
and a mixed-shape enrichment join (hash-partitioned big-big + broadcast
small dims).

**As-of join** (`events_asof_join`): attribute every event to the same
user's most recent ``signup`` event at-or-before it (inner as-of — events
preceding any signup drop). Ray Data has no ordered join, so the operator
is built from the parts the engine already trusts: hash-bucket the key
space so each bucket is one `map_groups` task, lexsort the group by
``(user_id, ts)`` once, and resolve the as-of predecessor with a vectorized
cummax over signup row indices — the same "latest state at-or-before"
shape as the commit-watermark gating in the CDC path
(olrx/pipelines/replay.py). Partitioning assumption (documented per the
operator contract): all rows of one ``user_id`` co-locate in one bucket;
bucket count scales with the cluster, per-bucket work is O(rows log rows)
in the bucket, never global. Reference analog: transaction events are
attributed to their enclosing txn by latest-begin-at-or-before-scn in the
reference's transaction buffer (/root/reference/src/parser/Parser.cpp,
SURVEY §2.3); this is the same temporal-attribution kernel on the
user-facing events table.

**Enrichment join** (`orders_enrich`): orders ⋈ customer is big-big at
warehouse scale → Ray's hash-shuffle `Dataset.join`; nation/region are
genuinely bounded dims → broadcast once (`ray.put`) and resolved with a
searchsorted probe inside `map_batches`; revenue pre-aggregates per batch
(combiner) so the final groupby moves partials only. One operator, all
three join shapes placed where each belongs at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

# --------------------------------------------------------------------------
# events_asof_join
# --------------------------------------------------------------------------

#: as-of buckets — enough tasks to feed the cluster; each holds ~1/B of the
#: key space so group size stays bounded as the corpus grows
def _asof_buckets() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(8, 4 * cpus)


def q_events_asof_join(sf_dir: str) -> rd.Dataset:
    """Each event joined to the same user's most recent signup at-or-before
    its timestamp (inner as-of). Output: event_id, user_id, ts, signup_ts."""
    buckets = _asof_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def bucketed(t: pa.Table) -> pa.Table:
        b = (t["user_id"].to_numpy(zero_copy_only=False)
             % np.int64(buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def attach(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        is_signup = (pa.compute.equal(g["event_type"], "signup")
                     .to_numpy(zero_copy_only=False))[order]
        idx = np.arange(len(uid_s), dtype=np.int64)
        # latest signup row index at-or-before each row, per user: a cummax
        # over signup indices; a carried index from the previous user fails
        # the uid equality check below (indices only ever grow within the
        # sort, so any same-user signup dominates a prior user's)
        marker = np.where(is_signup, idx, -1)
        att = np.maximum.accumulate(marker)
        ok = (att >= 0)
        ok[ok] &= uid_s[att[ok]] == uid_s[ok]
        keep = np.flatnonzero(ok)
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(
                zero_copy_only=False)[order][keep], pa.int64()),
            "user_id": pa.array(uid_s[keep], pa.int64()),
            "ts": pa.array(ts_s[keep]),
            "signup_ts": pa.array(ts_s[att[keep]]),
        })

    return (ds.map_batches(bucketed, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(attach, batch_format="pyarrow"))


def sql_events_asof_join(sf_dir: str) -> str:
    return """
SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
FROM events e
ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


# --------------------------------------------------------------------------
# orders_enrich
# --------------------------------------------------------------------------

def q_orders_enrich(sf_dir: str) -> rd.Dataset:
    """Revenue by region name and customer market segment: orders ⋈ customer
    (hash-shuffle join: both sides scale with the warehouse) with
    nation→region resolved from a broadcast dim table, pre-aggregated per
    batch before the small final groupby."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    joined = orders.join(cust, "inner", num_partitions=max(2, cpus),
                         on=("o_custkey",), right_on=("c_custkey",))

    # nation ⋈ region is a few dozen rows anywhere: build the nationkey →
    # region-name map once on the driver, broadcast the sorted arrays
    import pyarrow.parquet as pq
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rnames = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nk = nat["n_nationkey"].to_numpy()
    rn = np.array([rnames[k] for k in nat["n_regionkey"].to_pylist()],
                  dtype=object)
    o = np.argsort(nk)
    dim_ref = ray.put((nk[o], rn[o]))
    holder: list = []

    def partial(t: pa.Table) -> pa.Table:
        if not holder:
            holder.append(ray.get(dim_ref))
        keys, names = holder[0]
        r_name = names[np.searchsorted(
            keys, t["c_nationkey"].to_numpy(zero_copy_only=False))]
        import pandas as pd
        # exact integer cents: float sums of 1e8-magnitude revenue differ in
        # the last bits by summation order, flipping any rounded decimal;
        # to_cents rounds half away from zero, matching the oracle's round()
        from olrx.ops.events import to_cents
        cents = to_cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "r_name": r_name,
            "c_mktsegment": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            "cents": cents})
        g = df.groupby(["r_name", "c_mktsegment"], as_index=False).agg(
            n_orders=("cents", "size"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    out = (joined.map_batches(partial, batch_format="pyarrow")
                 .groupby(["r_name", "c_mktsegment"])
                 .aggregate(Sum("n_orders", alias_name="n_orders"),
                            Sum("cents", alias_name="cents")))

    def finish(t: pa.Table) -> pa.Table:
        rev = t["cents"].to_numpy(zero_copy_only=False) / 100.0
        return t.drop_columns(["cents"]).append_column(
            "revenue", pa.array(rev, pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


def sql_orders_enrich(sf_dir: str) -> str:
    return """
SELECT r.r_name, c.c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, c.c_mktsegment
"""
