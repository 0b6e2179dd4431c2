"""Naive single-process reference apply — the test oracle.

Mirrors the reference's semantics directly and slowly (row loop; test scale
only). This is the analog of the reference's LogMiner cross-validation step
(/root/reference/tests/README.md:56-67): an independent, trivially-auditable
implementation the distributed engine must match row-for-row.

Semantics implemented (SURVEY §7.1):
1. Only committed transactions mutate state; R-terminated or open txns are
   dropped (/root/reference/src/parser/Transaction.cpp:207-210).
2. Events apply in ``(commit_scn, scn, scn_idx)`` order.
3. I sets the full row; U merges columns whose ``changed_mask`` bit is set
   (missing = unchanged, explicit null = null —
   /root/reference/src/builder/Builder.cpp:1467-1542); D removes the row.
4. Additive schema evolution: a DDL event at its commit SCN widens the table
   schema; earlier rows read null for new columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from olrx import schema as S


def apply_naive(changelog: pa.Table, start_watermark: tuple[int, int, int] = (-1, -1, -1),
                include_table: bool = False) -> pa.Table:
    """Replay a changelog table to final transcript state.

    ``start_watermark`` = (commit_scn, scn, scn_idx): events at or below are
    skipped (the exactly-once re-emission filter,
    /root/reference/src/metadata/Metadata.cpp:716-727).
    ``include_table``: key state on (table_name, conv_id, turn_idx) and emit
    the table_name column (multi-table streams).
    """
    df = changelog.to_pandas(types_mapper=None)
    commits = {r.xid: r.scn for r in df[df["op"] == "C"].itertuples()}

    ev = df[df["op"].isin(["I", "U", "D", "DDL"])].copy()
    # partial rollbacks: drop the exact ops each PR undo vector names
    # (/root/reference/src/parser/Transaction.cpp:73-148)
    if "undo_scn" in df.columns:
        pr = df[df["op"] == "PR"]
        if len(pr):
            undone = set(zip(pr["xid"],
                             pr["undo_scn"].astype("int64"),
                             pr["undo_scn_idx"].astype("int64")))
            key = list(zip(ev["xid"], ev["scn"].astype("int64"),
                           ev["scn_idx"].astype("int64")))
            ev = ev[[k not in undone for k in key]]
    ev["commit_scn"] = ev["xid"].map(commits)
    ev = ev[ev["commit_scn"].notna()]
    ev = ev.sort_values(["commit_scn", "scn", "scn_idx"], kind="stable")

    all_cols = [n for n, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]
    state: dict[tuple[str, int], dict] = {}
    schema_version = 0
    dropped: list[str] = []
    renamed: dict[str, str] = {}   # physical → current display name
    import json as _json

    def _phys(name: str) -> str:
        for k, v in renamed.items():
            if v == name:
                return k
        return name

    for row in ev.itertuples():
        pos = (row.commit_scn, row.scn, row.scn_idx)
        if pos <= start_watermark:
            continue
        if row.op == "DDL":
            try:
                p = _json.loads(row.ddl) if row.ddl else {}
            except (TypeError, ValueError):
                p = {}
            if p.get("drop_columns"):
                # non-additive: the column vanishes from the table schema
                # (SystemTransaction.cpp:640); prior row values are discarded
                dropped.extend(_phys(c) for c in p["drop_columns"]
                               if _phys(c) not in dropped)
            elif p.get("rename_columns"):
                # dictionary-row UPDATE (SystemTransaction.cpp:525): display
                # name changes, data and column identity do not
                for old, new in sorted(p["rename_columns"].items()):
                    renamed[_phys(old)] = new
            else:
                schema_version = min(schema_version + 1, S.MAX_SCHEMA_VERSION)
            continue
        key = ((row.table_name, row.conv_id, int(row.turn_idx))
               if include_table else (row.conv_id, int(row.turn_idx)))
        if row.op == "D":
            state.pop(key, None)
            continue
        img = row.after or {}
        mask = int(row.changed_mask)
        if row.op == "I":
            state[key] = {c: img.get(c) for c in all_cols}
        else:  # U — merge changed columns only
            cur = state.get(key)
            if cur is None:
                cur = {c: None for c in all_cols}
                state[key] = cur
            for i, c in enumerate(all_cols):
                if mask & (1 << i):
                    cur[c] = img.get(c)

    cols = [n for n, _ in S.payload_columns(schema_version)
            if n not in dropped]
    keys = sorted(state)
    if include_table:
        data = {
            "table_name": [k[0] for k in keys],
            "conv_id": [k[1] for k in keys],
            "turn_idx": pd.array([k[2] for k in keys], dtype="int32"),
        }
    else:
        data = {
            "conv_id": [k[0] for k in keys],
            "turn_idx": pd.array([k[1] for k in keys], dtype="int32"),
        }
    renamed = {p: n for p, n in renamed.items() if n != p}
    for c in cols:
        data[renamed.get(c, c)] = [state[k][c] for k in keys]
    out = pa.Table.from_pydict(data)
    return out.cast(S.transcripts_schema(schema_version,
                                         include_table=include_table,
                                         dropped=tuple(dropped),
                                         renamed=renamed))
