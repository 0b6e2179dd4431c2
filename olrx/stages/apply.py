"""Per-partition merge-apply: the vectorized core of the engine.

Reproduces the semantics of the reference's row-image merge
(``Builder::processDml``, /root/reference/src/builder/Builder.cpp:896-1735):

- apply order ``(commit_scn, scn, scn_idx)`` per row key
  (commit-order emission, /root/reference/src/writer/Writer.cpp:134-138)
- I sets the full row; U merges columns whose ``changed_mask`` bit is set
  (unchanged columns carried forward, explicit nulls honored —
  Builder.cpp:1467-1542); D removes the row; later I re-creates it
- a column value never survives across a delete (null-fill semantics,
  Builder.cpp:1614-1624)

All segment-wise (per row-key) reductions are ``np.maximum.reduceat`` over
index arrays — no Python loop over rows or keys. Cost is O(n log n) for the
lexsort plus O(n · n_cols) for the column reductions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from olrx import schema as S
from olrx.stages.decode import OP_D, OP_I, OP_U


def merge_apply(group: pa.Table, schema_version: int) -> pa.Table:
    """Reduce a partition's decoded events to final transcript rows.

    ``group`` has decode-stage layout: key columns, ``op``, order columns,
    ``changed_mask`` and ``v_<payload>`` value columns (full-width). Output
    is ``transcripts_schema(schema_version)``.
    """
    payload = [n for n, _ in S.payload_columns(schema_version)]
    n = group.num_rows
    if n == 0:
        return S.transcripts_schema(schema_version).empty_table()

    group = group.combine_chunks()
    conv_dict = pc.dictionary_encode(group["conv_id"])
    codes = conv_dict.combine_chunks().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = group["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    cscn = group["commit_scn"].to_numpy(zero_copy_only=False).astype(np.int64)
    scn = group["scn"].to_numpy(zero_copy_only=False).astype(np.int64)
    sidx = group["scn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)

    order = np.lexsort((sidx, scn, cscn, turn, codes))
    codes, turn = codes[order], turn[order]
    sorted_tbl = group.take(pa.array(order))

    new_seg = np.empty(n, bool)
    new_seg[0] = True
    new_seg[1:] = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
    seg_starts = np.flatnonzero(new_seg)
    seg_of = np.cumsum(new_seg) - 1

    op = sorted_tbl["op_code"].to_numpy(zero_copy_only=False)
    mask = sorted_tbl["changed_mask"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)

    def seg_max(values: np.ndarray) -> np.ndarray:
        return np.maximum.reduceat(values, seg_starts)

    is_d = op == OP_D
    last_d = seg_max(np.where(is_d, idx, -1))
    last_alive = seg_max(np.where(~is_d, idx, -1))
    exists = last_alive > last_d                      # row survives its last delete

    out_cols: dict[str, pa.Array] = {}
    keep = np.flatnonzero(exists)
    key_idx = seg_starts[keep]                        # one representative row per kept key
    key_take = pa.array(key_idx)
    out_cols["conv_id"] = sorted_tbl["conv_id"].take(key_take)
    out_cols["turn_idx"] = sorted_tbl["turn_idx"].take(key_take).cast(pa.int32())

    for bit, name in enumerate([nm for nm, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]):
        if name not in payload:
            continue
        col_set = (mask >> bit) & 1
        val_idx = seg_max(np.where((col_set == 1) & ~is_d, idx, -1))
        valid = (val_idx > last_d) & exists           # never read across a delete
        gather = np.where(valid, val_idx, 0)[keep]
        vals = sorted_tbl[f"v_{name}"].take(pa.array(gather))
        invalid = ~valid[keep]
        if invalid.any():
            vals = pc.if_else(pa.array(invalid), pa.nulls(len(gather), vals.type), vals)
        out_cols[name] = vals

    out = pa.table(out_cols)
    return out.cast(S.transcripts_schema(schema_version))


def apply_stats(group: pa.Table) -> dict[str, int]:
    """Lineage counters for a partition's event group (reference analog:
    dml_ops / transactions metrics, /root/reference/src/common/metrics/Metrics.h)."""
    op = group["op_code"].to_numpy(zero_copy_only=False)
    return {
        "events": len(op),
        "inserts": int((op == OP_I).sum()),
        "updates": int((op == OP_U).sum()),
        "deletes": int((op == OP_D).sum()),
    }
