"""Relational + clustering + repetition ops: semantic unit tests on tiny
hand-built inputs (independent of the generated sf tables and the SQL
oracles)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(f"2024-01-{s}", "us")


def test_asof_join_semantics(tmp_path):
    # user 1: signup @05, events @03 (drops), @05 (self), @07, signup @10,
    #   event @12 (attributes to @10)
    # user 2: no signup → all drop
    rows = [
        (0, 1, _ts("03"), "click"),
        (1, 1, _ts("05"), "signup"),
        (2, 1, _ts("07"), "view"),
        (3, 1, _ts("10"), "signup"),
        (4, 1, _ts("12"), "purchase"),
        (5, 2, _ts("04"), "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    from olrx.ops.relational import q_events_asof_join

    out = (q_events_asof_join(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert list(out.event_id) == [1, 2, 3, 4]
    got = dict(zip(out.event_id, out.signup_ts.astype("datetime64[us]")))
    assert got[1] == _ts("05")   # a signup attributes to itself
    assert got[2] == _ts("05")
    assert got[3] == _ts("10")
    assert got[4] == _ts("10")   # latest signup wins, not the first


def test_asof_cummax_does_not_leak_across_users(tmp_path):
    # user 5 has a signup; user 6 (sorted after) has none — the cummax
    # carries user 5's index, the uid check must reject it
    t = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "user_id": pa.array([5, 6], pa.int64()),
        "ts": pa.array([_ts("01"), _ts("02")], pa.timestamp("us")),
        "event_type": pa.array(["signup", "click"]),
        "value": pa.array([0.0, 0.0]),
        "props": pa.array(["{}", "{}"]),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    from olrx.ops.relational import q_events_asof_join

    out = q_events_asof_join(str(tmp_path)).to_pandas()
    assert list(out.event_id) == [0]


def test_orders_enrich_revenue(tmp_path):
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 10, 20], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3),
        "o_totalprice": pa.array([100.25, 50.50, 10.00]),
        "o_orderdate": pa.array([_ts("01")] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3),
    }), f"{tmp_path}/orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 30], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array([0, 1, 1], pa.int32()),
        "c_acctbal": pa.array([0.0] * 3),
        "c_mktsegment": pa.array(["BUILDING", "AUTO", "AUTO"]),
    }), f"{tmp_path}/customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NA", "NB"]),
        "n_regionkey": pa.array([0, 1], pa.int32()),
    }), f"{tmp_path}/nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["EAST", "WEST"]),
    }), f"{tmp_path}/region.parquet")
    from olrx.ops.relational import q_orders_enrich

    out = (q_orders_enrich(str(tmp_path)).to_pandas()
           .sort_values(["r_name"]).reset_index(drop=True))
    # cust 30 has no orders → absent; exact cents survive the float round-trip
    assert list(out.r_name) == ["EAST", "WEST"]
    assert list(out.n_orders) == [2, 1]
    assert list(out.revenue) == [150.75, 10.00]


def test_repetition_stats_values():
    from olrx.ops.text import repetition_stats

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a b c", "x x x x", ""]),
    })
    out = repetition_stats(batch).to_pandas()
    # doc 0: 5 words, 3 distinct, top 'a'/'b'=2, bigrams: ab,ba,ab,bc →
    #   'a b' twice → dup positions 2 of 4
    assert list(out.n_words) == [5, 4, 0]
    assert out.distinct_word_ratio[0] == round(3 / 5, 9)
    assert out.top_word_frac[0] == round(2 / 5, 9)
    assert out.dup_bigram_frac[0] == round(2 / 4, 9)
    # doc 1: all same word → ratio 1/4, top 1.0, all 3 bigrams identical
    assert out.top_word_frac[1] == 1.0
    assert out.dup_bigram_frac[1] == 1.0
    # empty doc: all zeros
    assert out.distinct_word_ratio[2] == 0.0


def test_kmeans_two_blobs(tmp_path):
    # two well-separated blobs; init picks one vector from each (vec_ids
    # 0 and 1 are in different blobs) → perfect separation after 2 passes
    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.05, (30, 8)).astype(np.float32)
    b = rng.normal(5.0, 0.05, (30, 8)).astype(np.float32) * np.float32(1.0)
    vecs = np.empty((60, 8), np.float32)
    vecs[0::2] = a
    vecs[1::2] = b
    pq.write_table(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32(), 8)),
        "label": pa.array([0] * 60, pa.int32()),
    }), f"{tmp_path}/embeddings.parquet")
    from olrx.ops.cluster import q_kmeans_embed

    out = (q_kmeans_embed(str(tmp_path), k=2).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    c = out.cluster.to_numpy()
    # every even vec shares vec 0's cluster, every odd shares vec 1's
    assert (c[0::2] == c[0]).all() and (c[1::2] == c[1]).all()
    assert c[0] != c[1]
