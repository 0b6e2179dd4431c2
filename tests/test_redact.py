"""PII redaction: the Arrow RE2 kernels must agree byte-for-byte with the
DuckDB (also RE2) oracle, and the stage must be pure-Arrow (no Python rows)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from olrx.ops.redact import Redactor, q_text_redact, sql_text_redact

SF = "/root/testdata/sf0.001"


def _docs() -> pa.Table:
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_redactor_matches_oracle_bytes():
    t = _docs()
    got = Redactor()(t).sort_by("doc_id")
    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(sql_text_redact(SF)).arrow().sort_by("doc_id")
    assert got.schema.names == want.schema.names
    for c in got.schema.names:
        assert got[c].to_pylist() == want[c].to_pylist(), c


def test_redactor_detects_and_masks():
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["mail a.b+c@x-y.org or 10.0.0.1",
                          "call 555-123-4567 x2"], pa.string()),
    })
    out = Redactor(inject=False)(t)
    assert out["n_emails"].to_pylist() == [1, 0]
    assert out["n_ips"].to_pylist() == [1, 0]
    assert out["n_phones"].to_pylist() == [0, 1]
    assert out["clean_text"].to_pylist() == [
        "mail [EMAIL] or [IP]", "call [PHONE] x2"]
    assert out["n_emails"].type == pa.int64()


def test_query_runs_distributed():
    out = q_text_redact(SF)
    t = out.to_pandas()
    assert len(t) == 500
    assert (t["n_emails"] >= 0).all() and t["n_emails"].sum() > 0
