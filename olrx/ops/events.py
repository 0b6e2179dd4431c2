"""Stream-shaped operators over the `events` table (windowing/sessionization).

Ray Data has no event-time windows; per the streaming-workloads pattern the
input is treated as a keyed, ts-sorted log: tumbling windows are a pre-
aggregated groupby on (key, window), sessions are per-key `map_groups` over
the sorted group (gap rule). Reference analog: the engine's watermark
bookkeeping is per-shard max-scn (SURVEY §2.5); these ops are the user-facing
aggregation surface a CDC consumer typically runs downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SESSION_GAP_MIN = 30


def to_cents(v: np.ndarray) -> np.ndarray:
    """float value → int64 cents, rounding half AWAY FROM ZERO — DuckDB's
    round() semantics. np.rint rounds half-to-even, which diverges from the
    oracle whenever value*100 lands exactly on k+0.5 in float64 (e.g. 0.125
    → rint 12 vs round 13; ADVICE r4 #3 — latent, no current testdata row
    hits it)."""
    x = np.asarray(v, np.float64) * 100.0
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def q_events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h window per event_type: count + sum(value).

    Pre-aggregates per batch (one row per (type, hour) per batch) before the
    shuffle — the combiner pattern; the groupby moves partials only."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        # exact integer cents: float partial sums differ in the last ulp by
        # summation order (proven on the hopping window at sf0.01) — sum
        # int64 cents and divide once at the very end
        df["cents"] = to_cents(df["value"].to_numpy())
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "hour"])
             .aggregate(Sum("n", alias_name="n"),
                        Sum("cents", alias_name="cents")))

    def finish(t: pa.Table) -> pa.Table:
        t = _cents_to_sum_value(t)
        i = t.schema.get_field_index("hour")
        return t.set_column(i, "hour", t["hour"].cast(pa.timestamp("us")))

    return out.map_batches(finish, batch_format="pyarrow")


def _cents_to_sum_value(t: pa.Table) -> pa.Table:
    """Replace an int64 ``cents`` column with float64 ``sum_value`` — one
    deterministic division, identical on any summation order."""
    sv = t["cents"].to_numpy(zero_copy_only=False) / 100.0
    return t.drop_columns(["cents"]).append_column(
        "sum_value", pa.array(sv, pa.float64()))


def sql_events_hourly(sf_dir: str) -> str:
    return """
SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


#: hopping window geometry: 1 h windows advancing every 15 min
_HOP_MIN = 15
_WIN_HOPS = 4          # window length = 4 hops


def q_events_sliding_window(sf_dir: str) -> rd.Dataset:
    """HOPPING (sliding) 1h/15min window per event_type: count + sum(value)
    for every window an event falls into. Each event belongs to exactly
    ``_WIN_HOPS`` windows, so the batch kernel replicates rows with one
    ``np.repeat``/tile (no Python loop) and pre-aggregates per batch before
    the shuffle — the combiner pattern: the groupby moves one partial row
    per (type, window) per batch, ~4× `events_hourly`'s partials regardless
    of corpus size. Ray Data has no event-time window operator; this is the
    composition that replaces it (window assignment is a stateless map, the
    pane aggregate is an ordinary groupby)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hop = pd.Timedelta(minutes=_HOP_MIN)
        base = df["ts"].dt.floor(f"{_HOP_MIN}min")
        n = len(df)
        # window starts: floor(ts, hop) - k*hop for k = 0.._WIN_HOPS-1
        starts = (base.to_numpy()[:, None]
                  - np.arange(_WIN_HOPS) * hop.to_numpy()).ravel()
        cents = to_cents(df["value"].to_numpy())
        rep = pd.DataFrame({
            "event_type": np.repeat(df["event_type"].to_numpy(), _WIN_HOPS),
            "win_start": starts,
            "cents": np.repeat(cents, _WIN_HOPS),
        })
        g = rep.groupby(["event_type", "win_start"], as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "win_start"])
             .aggregate(Sum("n", alias_name="n"),
                        Sum("cents", alias_name="cents")))

    def finish(t: pa.Table) -> pa.Table:
        t = _cents_to_sum_value(t)
        # numpy datetime arithmetic above lands on timestamp[s]; the oracle
        # (and the events schema) is microseconds — pin it explicitly
        i = t.schema.get_field_index("win_start")
        return t.set_column(i, "win_start", t["win_start"].cast(pa.timestamp("us")))

    return out.map_batches(finish, batch_format="pyarrow")


def sql_events_sliding_window(sf_dir: str) -> str:
    return f"""
WITH k AS (SELECT unnest(range({_WIN_HOPS})) AS k),
w AS (
  SELECT e.event_type, e.value,
         time_bucket(INTERVAL {_HOP_MIN} MINUTE, e.ts)
           - k.k * INTERVAL {_HOP_MIN} MINUTE AS win_start
  FROM events e CROSS JOIN k
)
SELECT event_type, win_start, count(*) AS n,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM w GROUP BY event_type, win_start
"""


def q_events_sessions(sf_dir: str) -> rd.Dataset:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds 30 min. Users are hash-bucketed into
    `coarse_buckets()` groups (all events of one user co-locate — the
    documented partitioning assumption) and each map_groups call
    sessionizes EVERY user in its bucket with one sort + one vectorized
    boundary scan — never one Python call per user (that costs a
    pandas round-trip per key; see scaling.coarse_buckets)."""
    from olrx.ops.scaling import coarse_buckets

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ncb = coarse_buckets()

    def with_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(ncb)
        return t.append_column("ub", pa.array(b.astype(np.int32)))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        uid = g["user_id"].to_numpy()
        new_user = np.ones(len(g), bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = g["ts"].diff().dt.total_seconds().to_numpy()
        sid = np.cumsum(new_user | (gap > SESSION_GAP_MIN * 60))
        g["cents"] = to_cents(g["value"].to_numpy())
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"), cents=("cents", "sum"))
        out["sum_value"] = out["cents"].to_numpy() / 100.0
        return out.reset_index(drop=True)[
            ["user_id", "session_start", "session_end", "n_events", "sum_value"]]

    return (ds.map_batches(with_bucket, batch_format="pyarrow")
              .groupby("ub").map_groups(sessions, batch_format="pandas"))


def sql_events_sessions(sf_dir: str) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM numbered GROUP BY user_id, session_id
"""


def q_events_condition_filter(sf_dir: str) -> rd.Dataset:
    """§2.6 condition mini-language applied to a real table: compiled once,
    evaluated as Arrow masks per batch."""
    from olrx.functions.condition import Condition

    cond = Condition("event_type IN ('click', 'view') AND value != NULL "
                     "AND NOT (user_id == 0)")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "value"])
    return ds.map_batches(cond.filter, batch_format="pyarrow")


def sql_events_condition_filter(sf_dir: str) -> str:
    return """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  AND NOT (user_id = 0)
"""


def q_events_topk_users(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k users by total value: pre-agg partials → small groupby → sort →
    limit. The sort runs over one row per user, not per event."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = to_cents(df["value"].to_numpy())
        g = df.groupby("user_id", as_index=False)["cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Sum("cents", alias_name="cents"))
             .sort(["cents", "user_id"], descending=[True, False])
             .limit(k))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    tv = t["cents"].to_numpy(zero_copy_only=False) / 100.0
    return t.drop_columns(["cents"]).append_column(
        "total_value", pa.array(tv, pa.float64()))


def sql_events_topk_users(sf_dir: str, k: int = 20) -> str:
    return f"""
SELECT user_id,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY user_id
ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC, user_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Per-group exact quantiles — distributed value histogram, no global sort
# ---------------------------------------------------------------------------

#: nearest-rank quantiles reported per event_type
_VALUE_QS = (0.5, 0.9, 0.99)


def q_events_value_quantiles(sf_dir: str, qs: tuple = _VALUE_QS) -> pa.Table:
    """Exact per-event_type nearest-rank quantiles of ``value`` — the
    per-group outlier/clipping thresholds a feature pipeline derives.

    Same shape as `token_length_quantiles` but PER GROUP: per-batch
    (type, value) count partials → one groupby over the distinct-value
    space (money-shaped values have a bounded cents domain, so the
    histogram compresses at scale where a global sort would move every
    row) → coarse-bucketed cumsum + nearest-rank select (one vectorized
    kernel per bucket, never one Python call per type). Output is
    #types × #qs rows."""
    from ray.data.aggregate import Sum

    from olrx.ops.scaling import coarse_buckets

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby(["event_type", "value"], sort=False)
              .size().reset_index(name="n"))
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "value"])
              .aggregate(Sum("n", alias_name="n")))

    ncb = coarse_buckets()

    def with_b(df: pd.DataFrame) -> pd.DataFrame:
        b = (pd.util.hash_array(df["event_type"].to_numpy(object))
             % np.uint64(ncb)).astype(np.int32)
        return df.assign(b=b)

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "value"]).reset_index(drop=True)
        grp = g.groupby("event_type", sort=False)["n"]
        cum = grp.cumsum().to_numpy(np.int64)
        tot = grp.transform("sum").to_numpy(np.int64)
        outs = []
        for q in qs:
            # nearest rank: first value whose cumulative count reaches
            # ceil(q·tot) — double multiply matches the SQL mirror exactly
            ok = g[cum >= np.ceil(q * tot)]
            first = ok.groupby("event_type", sort=False, as_index=False).first()
            outs.append(pd.DataFrame({"event_type": first["event_type"],
                                      "q": float(q),
                                      "value": first["value"]}))
        return pd.concat(outs, ignore_index=True)[["event_type", "q", "value"]]

    out = (hist.map_batches(with_b, batch_format="pandas")
               .groupby("b").map_groups(quantiles))
    df = out.to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def sql_events_value_quantiles(sf_dir: str, qs: tuple = _VALUE_QS) -> str:
    q_list = ", ".join(str(q) for q in qs)
    return f"""
WITH c AS (
  SELECT event_type, value, count(*) AS n FROM events GROUP BY event_type, value
), r AS (
  SELECT event_type, value,
         sum(n) OVER (PARTITION BY event_type ORDER BY value) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM c
)
SELECT event_type, q, min(value) AS value
FROM r CROSS JOIN (SELECT unnest([{q_list}]) AS q)
WHERE cum >= ceil(q * tot)
GROUP BY event_type, q
"""
