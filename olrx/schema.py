"""Arrow schemas for the change-event stream and the transcripts lake table.

Re-models the reference's row/record data model (redo record → vector pair →
values matrix, /root/reference/src/common/RedoLogRecord.h:34-121 and
/root/reference/src/builder/Builder.h:153-158) as columnar Arrow:

- one changelog row  = one change event (op-tagged, full/partial images)
- transcripts table  = the materialized lake table per BASELINE.json input_hint

Schema evolution is additive (reference: SystemTransaction commit applies
dictionary DML at an SCN, /root/reference/src/builder/SystemTransaction.cpp:729;
schema serialized into checkpoints, SerializerJson.cpp:805-820). Here the
schema registry is a versioned list of column sets; version k = BASE_COLUMNS +
first k entries of ADDITIVE_COLUMNS.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# transcripts lake table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: payload columns of a transcript turn, in canonical order. ``changed_mask``
#: bit i refers to PAYLOAD_COLUMNS[i] (+ additive columns appended after).
PAYLOAD_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]

#: additive-evolution columns, in the order DDL events may introduce them
#: (reference analog: the ddl-add-column fixture, /root/reference/PLAN.md:387).
ADDITIVE_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("tool_meta", pa.string()),
]

KEY_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
]


def payload_columns(schema_version: int = 0) -> list[tuple[str, pa.DataType]]:
    """Payload columns at a given schema version (0 = base)."""
    if schema_version < 0 or schema_version > len(ADDITIVE_COLUMNS):
        raise ValueError(f"unknown schema_version {schema_version}")
    return PAYLOAD_COLUMNS + ADDITIVE_COLUMNS[:schema_version]


def transcripts_schema(schema_version: int = 0,
                       include_table: bool = False,
                       dropped: tuple[str, ...] = (),
                       renamed: "dict[str, str] | None" = None) -> pa.Schema:
    """Lake-table schema. ``include_table`` prepends the ``table_name`` key
    column (multi-table replay, reference Schema dictionary tracking many
    tables via owner/table maps, /root/reference/src/metadata/Schema.h:119-129);
    single-table pipelines keep the historical two-column key.

    ``dropped``: payload columns removed by committed DROP DDLs
    (non-additive evolution — the reference's SystemTransaction handles
    dictionary-row DELETE too, SystemTransaction.cpp:640); the lake schema
    after a drop simply lacks the column. Re-adding a previously dropped
    column is out of scope (a fresh dictionary column in the reference).

    ``renamed``: physical → current display name for columns renamed by
    committed RENAME DDLs (reference SystemTransaction::processUpdate of a
    dictionary row, SystemTransaction.cpp:525 — the column ID and its data
    are untouched; only the name mapping changes). Payload columns keep
    their physical identity (mask bits, ``v_<physical>`` event columns)
    end to end; the rename applies at the OUTPUT boundary only."""
    head = [("table_name", pa.string())] if include_table else []
    rn = renamed or {}
    payload = [(rn.get(n, n), t) for n, t in payload_columns(schema_version)
               if n not in dropped]
    return pa.schema(head + KEY_COLUMNS + payload)


MAX_SCHEMA_VERSION = len(ADDITIVE_COLUMNS)

# ---------------------------------------------------------------------------
# changelog (synthetic redo stream)
# ---------------------------------------------------------------------------

#: ops — reference opcodes collapse to these tags (SURVEY §2.2):
#: B=begin (0x0502), C=commit / R=rollback (0x0504), I=insert (0x0B02/0x0B0B),
#: U=update (0x0B05/0x0B10), D=delete (0x0B03/0x0B0C), DDL=schema change
#: (0x1801), PR=partial rollback / rollback-to-savepoint (0x0506/0x050B —
#: the undo vector targets one specific prior change of the same txn, which
#: the reference pairs off the top of the transaction buffer,
#: /root/reference/src/parser/Transaction.cpp:73-148; here the target is
#: carried explicitly as (undo_scn, undo_scn_idx)).
OPS = ("B", "C", "R", "I", "U", "D", "DDL", "PR")


def image_struct(schema_version: int = MAX_SCHEMA_VERSION) -> pa.DataType:
    """Row image struct (before/after). Full-width by default; early log
    segments may carry a narrower version (pre-DDL) — readers unify."""
    return pa.struct(payload_columns(schema_version))


def changelog_schema(schema_version: int = MAX_SCHEMA_VERSION) -> pa.Schema:
    """One change event per row.

    Ordering key of the stream is ``(scn, scn_idx)`` within a shard
    (reference: LwnMember sort key, /root/reference/src/parser/Parser.h:39-61);
    apply order for table state is ``(commit_scn, scn, scn_idx)``
    (reference: commit-order emission, /root/reference/src/writer/Writer.cpp:134-138).
    """
    img = image_struct(schema_version)
    return pa.schema(
        [
            ("table_name", pa.string()),  # owner.table analog (null on control rows)
            ("scn", pa.int64()),          # event SCN (Scn — types/Scn.h:27)
            ("scn_idx", pa.int32()),      # intra-SCN tiebreak (subScn/lwnIdx)
            ("seq", pa.int32()),          # log segment sequence within shard (Seq)
            ("shard", pa.int16()),        # redo thread id (RAC analog)
            ("xid", pa.string()),         # transaction id (Xid usn.slt.sqn)
            ("op", pa.string()),          # one of OPS
            ("conv_id", pa.string()),     # row key (null for B/C/R/DDL)
            ("turn_idx", pa.int32()),     # row key (null for B/C/R/DDL)
            ("before", img),              # undo image (U/D), else null
            ("after", img),               # redo image (I/U), else null
            # bit i set ⇒ payload column i present in `after` (changed).
            # I events set all bits; U events set changed bits only
            # (reference: COLUMN_FORMAT::CHANGED drop of unchanged cols,
            # /root/reference/src/builder/Builder.cpp:1467-1506).
            ("changed_mask", pa.int32()),
            ("changed_cols", pa.list_(pa.string())),  # human/SQL mirror of the mask
            ("ddl", pa.string()),         # JSON payload for DDL events, else null
            # PR (partial rollback) events: the (scn, scn_idx) of the same
            # txn's DML op this record undoes; null otherwise
            ("undo_scn", pa.int64()),
            ("undo_scn_idx", pa.int32()),
            ("ts", pa.timestamp("us")),   # event wall-clock timestamp
        ]
    )


def column_bit(name: str) -> int:
    """Bit index of a payload column in ``changed_mask``."""
    names = [n for n, _ in PAYLOAD_COLUMNS + ADDITIVE_COLUMNS]
    return names.index(name)


def full_mask(schema_version: int = MAX_SCHEMA_VERSION) -> int:
    return (1 << len(payload_columns(schema_version))) - 1
