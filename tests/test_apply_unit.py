"""merge_apply kernel edge cases (semantic contract of SURVEY §7.1)."""

import pyarrow as pa

from olrx import schema as S
from olrx.stages.apply import merge_apply

FULL = S.full_mask(1)
BIT = {n: 1 << S.column_bit(n) for n, _ in S.payload_columns(1)}


def _events(rows):
    """rows: (conv, turn, op, commit_scn, scn, scn_idx, mask, role, text, tool, ts, meta)"""
    code = {"I": 0, "U": 1, "D": 2}
    cols = list(zip(*rows))
    t = {
        "conv_id": pa.array(cols[0], pa.string()),
        "turn_idx": pa.array(cols[1], pa.int32()),
        "op_code": pa.array([code[o] for o in cols[2]], pa.int8()),
        "commit_scn": pa.array(cols[3], pa.int64()),
        "scn": pa.array(cols[4], pa.int64()),
        "scn_idx": pa.array(cols[5], pa.int32()),
        "changed_mask": pa.array(cols[6], pa.int32()),
        "v_role": pa.array(cols[7], pa.string()),
        "v_text": pa.array(cols[8], pa.string()),
        "v_tool": pa.array(cols[9], pa.string()),
        "v_ts": pa.array(cols[10], pa.timestamp("us")),
        "v_tool_meta": pa.array(cols[11], pa.string()),
    }
    return pa.table(t)


def _rows(out: pa.Table):
    return {(r["conv_id"], r["turn_idx"]): r for r in out.to_pylist()}


def test_insert_update_merge_carries_unchanged():
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", "toolA", 1, None),
        ("a", 0, "U", 20, 15, 1, BIT["text"], None, "t1", None, 2, None),
    ])
    out = _rows(merge_apply(g, 1))
    r = out[("a", 0)]
    assert r["text"] == "t1" and r["tool"] == "toolA" and r["role"] == "user"


def test_explicit_null_vs_missing():
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", "toolA", 1, None),
        ("a", 0, "U", 20, 15, 1, BIT["tool"], None, None, None, 2, None),  # tool→NULL
    ])
    r = _rows(merge_apply(g, 1))[("a", 0)]
    assert r["tool"] is None and r["text"] == "t0"


def test_delete_removes_row():
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", None, 1, None),
        ("a", 0, "D", 20, 15, 1, 0, None, None, None, 2, None),
    ])
    assert merge_apply(g, 1).num_rows == 0


def test_delete_then_reinsert():
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", "toolA", 1, None),
        ("a", 0, "D", 20, 15, 1, 0, None, None, None, 2, None),
        ("a", 0, "I", 30, 25, 1, FULL, "system", "t2", None, 3, None),
    ])
    r = _rows(merge_apply(g, 1))[("a", 0)]
    assert r["role"] == "system" and r["text"] == "t2" and r["tool"] is None


def test_no_value_survives_a_delete():
    """U after D without reinsert: pre-delete column values must NOT leak."""
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", "toolA", 1, None),
        ("a", 0, "D", 20, 15, 1, 0, None, None, None, 2, None),
        ("a", 0, "U", 30, 25, 1, BIT["text"], None, "t3", None, 3, None),
    ])
    r = _rows(merge_apply(g, 1))[("a", 0)]
    assert r["text"] == "t3" and r["tool"] is None and r["role"] is None


def test_lww_tiebreaks():
    """Same commit_scn: higher (scn, scn_idx) wins."""
    g = _events([
        ("a", 0, "I", 10, 5, 1, FULL, "user", "t0", None, 1, None),
        ("a", 0, "U", 10, 5, 2, BIT["text"], None, "t-later", None, 2, None),
        ("a", 0, "U", 10, 4, 9, BIT["text"], None, "t-earlier", None, 2, None),
    ])
    assert _rows(merge_apply(g, 1))[("a", 0)]["text"] == "t-later"


def test_interleaved_commit_order_beats_event_scn():
    """Event with lower scn but later commit wins (commit order rules)."""
    g = _events([
        ("a", 0, "I", 10, 9, 1, FULL, "user", "first", None, 1, None),
        ("a", 0, "U", 30, 2, 1, BIT["text"], None, "late-commit", None, 2, None),
        ("a", 0, "U", 20, 19, 1, BIT["text"], None, "mid-commit", None, 2, None),
    ])
    assert _rows(merge_apply(g, 1))[("a", 0)]["text"] == "late-commit"


def test_schema_version_0_drops_additive_column():
    g = _events([("a", 0, "I", 10, 5, 1, FULL, "user", "t0", None, 1, "m")])
    out = merge_apply(g, 0)
    assert "tool_meta" not in out.schema.names


def test_empty_group():
    out = merge_apply(_events([("a", 0, "I", 1, 1, 1, FULL, "u", "t", None, 1, None)])[:0], 1)
    assert out.num_rows == 0
    assert out.schema.equals(S.transcripts_schema(1))
