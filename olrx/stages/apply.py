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

Implementation note: the big payload columns (text!) are NEVER moved into
sort order. Only the int key columns are sorted (numpy lexsort + fancy
index); segment reductions run on those, producing *global* winner row
indices; the one and only payload copy is the final winner gather straight
from the unsorted input. This matters: on memory-bound nodes the naive
"sort the whole table then reduce" shape doubles DRAM traffic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from olrx import schema as S
from olrx.stages.decode import OP_D, OP_I, OP_U


def merge_apply(group: pa.Table, schema_version: int,
                dropped: tuple = (),
                renamed: "dict[str, str] | None" = None) -> pa.Table:
    """Reduce decoded events to final transcript rows.

    ``group`` has decode-stage layout: key columns, ``op_code``, order
    columns, ``changed_mask`` and ``v_<payload>`` value columns
    (full-width). Keys may span multiple hash partitions — ``(conv_id,
    turn_idx)`` is globally unique, so the reduction is partition-agnostic.
    Output is ``transcripts_schema(schema_version, dropped=dropped,
    renamed=renamed)``.

    ``dropped``: payload columns removed by committed DROP DDLs — excluded
    from the winner gather entirely (their payload bytes are never moved),
    so old-version rows stay replayable while the output schema lacks the
    column (reference SystemTransaction.cpp:640).

    ``renamed``: physical → current name from committed RENAME DDLs
    (reference SystemTransaction::processUpdate, SystemTransaction.cpp:525)
    — applied only when labeling the output columns; the merge itself runs
    entirely on physical identities (mask bits, ``v_<physical>``)."""
    payload = [n for n, _ in S.payload_columns(schema_version)
               if n not in dropped]
    rn = renamed or {}
    multi = "table_name" in group.column_names
    n = group.num_rows
    if n == 0:
        return S.transcripts_schema(schema_version, include_table=multi,
                                    dropped=dropped,
                                    renamed=rn).empty_table()

    def as_np(col) -> np.ndarray:
        # ChunkedArray.to_numpy on many chunks is a slow per-chunk path
        # (measured ~8 s on 4 int columns × 96 chunks × 4M rows); one
        # combine memcpy then a zero-copy view is ~100× faster
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False)

    def dict_codes(col) -> np.ndarray:
        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return d.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    codes = dict_codes(group["conv_id"])
    tcodes = dict_codes(group["table_name"]) if multi else None
    turn = as_np(group["turn_idx"]).astype(np.int64)
    cscn = as_np(group["commit_scn"]).astype(np.int64)
    scn = as_np(group["scn"]).astype(np.int64)
    sidx = as_np(group["scn_idx"]).astype(np.int64)
    op = as_np(group["op_code"])
    mask = as_np(group["changed_mask"]).astype(np.int64)

    sort_keys = (sidx, scn, cscn, turn, codes) if not multi \
        else (sidx, scn, cscn, turn, codes, tcodes)
    order = np.lexsort(sort_keys)
    codes_s, turn_s = codes[order], turn[order]
    op_s, mask_s = op[order], mask[order]

    new_seg = np.empty(n, bool)
    new_seg[0] = True
    new_seg[1:] = (codes_s[1:] != codes_s[:-1]) | (turn_s[1:] != turn_s[:-1])
    if multi:
        tcodes_s = tcodes[order]
        new_seg[1:] |= tcodes_s[1:] != tcodes_s[:-1]
    seg_starts = np.flatnonzero(new_seg)

    idx = np.arange(n, dtype=np.int64)

    def seg_max(values: np.ndarray) -> np.ndarray:
        return np.maximum.reduceat(values, seg_starts)

    is_d = op_s == OP_D
    last_d = seg_max(np.where(is_d, idx, -1))
    last_alive = seg_max(np.where(~is_d, idx, -1))
    exists = last_alive > last_d                      # row survives its last delete

    keep = np.flatnonzero(exists)
    key_global = order[seg_starts[keep]]              # one row per kept key
    key_take = pa.array(key_global)
    out_cols: dict[str, object] = {}
    if multi:
        out_cols["table_name"] = group["table_name"].take(key_take)
    out_cols.update({
        "conv_id": group["conv_id"].take(key_take),
        "turn_idx": group["turn_idx"].take(key_take).cast(pa.int32()),
    })

    for bit, name in enumerate([nm for nm, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]):
        if name not in payload:
            continue
        col_set = (mask_s >> bit) & 1
        val_idx = seg_max(np.where((col_set == 1) & ~is_d, idx, -1))
        valid = (val_idx > last_d) & exists           # never read across a delete
        # map sorted-domain winner positions back to global row indices and
        # gather straight from the unsorted table — the only payload copy
        gather_global = order[np.where(valid, val_idx, 0)][keep]
        vals = group[f"v_{name}"].take(pa.array(gather_global))
        invalid = ~valid[keep]
        if invalid.any():
            vals = pc.if_else(pa.array(invalid),
                              pa.nulls(len(gather_global), vals.type), vals)
        out_cols[rn.get(name, name)] = vals

    out = pa.table(out_cols)
    return out.cast(S.transcripts_schema(schema_version, include_table=multi,
                                         dropped=dropped, renamed=rn))


def compact_events(group: pa.Table) -> pa.Table:
    """Reduce an event set to the subset that can still influence any future
    merge: per key, the last delete row, the last alive row, and each
    column's latest setting row. "Latest X over a union = latest of the
    per-part latests", so compaction is a proper semigroup: appliers can
    fold it over arriving shards incrementally, keeping buffered state
    O(#keys) instead of O(#events) — the TransactionBuffer memory-bound
    analog (/root/reference/src/common/MemoryManager.cpp:197-260).
    """
    n = group.num_rows
    if n == 0:
        return group

    def as_np(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False)

    multi = "table_name" in group.column_names

    def dict_codes(col) -> np.ndarray:
        d = pc.dictionary_encode(col)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return d.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    codes = dict_codes(group["conv_id"])
    turn = as_np(group["turn_idx"]).astype(np.int64)
    cscn = as_np(group["commit_scn"]).astype(np.int64)
    scn = as_np(group["scn"]).astype(np.int64)
    sidx = as_np(group["scn_idx"]).astype(np.int64)
    op = as_np(group["op_code"])
    mask = as_np(group["changed_mask"]).astype(np.int64)

    sort_keys = (sidx, scn, cscn, turn, codes)
    if multi:
        tcodes = dict_codes(group["table_name"])
        sort_keys = sort_keys + (tcodes,)
    order = np.lexsort(sort_keys)
    codes_s, turn_s = codes[order], turn[order]
    op_s, mask_s = op[order], mask[order]
    new_seg = np.empty(n, bool)
    new_seg[0] = True
    new_seg[1:] = (codes_s[1:] != codes_s[:-1]) | (turn_s[1:] != turn_s[:-1])
    if multi:
        tcodes_s = tcodes[order]
        new_seg[1:] |= tcodes_s[1:] != tcodes_s[:-1]
    seg_starts = np.flatnonzero(new_seg)
    idx = np.arange(n, dtype=np.int64)

    def seg_max(values: np.ndarray) -> np.ndarray:
        return np.maximum.reduceat(values, seg_starts)

    is_d = op_s == OP_D
    keep_sorted = [seg_max(np.where(is_d, idx, -1)),
                   seg_max(np.where(~is_d, idx, -1))]
    n_cols = len(S.payload_columns(S.MAX_SCHEMA_VERSION))
    for bit in range(n_cols):
        keep_sorted.append(
            seg_max(np.where(((mask_s >> bit) & 1 == 1) & ~is_d, idx, -1)))
    kept = np.unique(np.concatenate(keep_sorted))
    kept = kept[kept >= 0]
    return group.take(pa.array(np.sort(order[kept])))


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
