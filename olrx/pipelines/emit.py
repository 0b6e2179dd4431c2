"""JSON message-stream emitter — the BuilderJson / WriterFile analog.

The reference's primary output is a newline-delimited JSON stream of
transaction envelopes: a ``begin`` message, one message per DML op carrying
``schema`` / ``rid`` / ``before`` / ``after`` images, a ``commit`` message,
plus ``ddl`` and ``chkpt`` records
(/root/reference/src/builder/BuilderJson.cpp:452-688, golden sample
/root/reference/tests/fixtures/expected/example-free-23/output.json). The
north-rule target here is the lake table; this emitter provides the stream
form for consumers that want reference-shaped messages (WriterFile analog,
/root/reference/src/writer/WriterFile.cpp:56-321).

Unlike the lake path, messages carry the UNDO image too: ``u`` and ``d``
payloads embed ``before`` (reference values matrix,
/root/reference/src/builder/Builder.h:153-158) so a downstream CDC consumer
can do its own merge.

Partitioned by commit-SCN range (not by conv), so each output file is a
contiguous, internally ordered slice of the global commit order — the
closest distributed equivalent of the reference's single totally-ordered
stream; one ``chkpt`` message closes every bucket (the checkpoint record,
BuilderJson.cpp:680). Consumers needing the total order read files in range
order.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from olrx import schema as S
from olrx.pipelines.replay import ReplayConfig
from olrx.stages.decode import load_control, mix_pr_keys

#: payload columns read for the message stream (keeps before AND after)
MESSAGE_COLUMNS = ["scn", "scn_idx", "xid", "op", "conv_id", "turn_idx",
                   "before", "after", "changed_mask", "ddl", "table_name"]

_COMMIT_IDX = 1 << 30
_CHKPT_IDX = (1 << 30) + 1


def _image_dict(struct_col: pa.ChunkedArray, sel: np.ndarray) -> list:
    """Row dicts (or None) for the selected struct rows."""
    if isinstance(struct_col, pa.ChunkedArray):
        struct_col = struct_col.combine_chunks()
    taken = struct_col.take(pa.array(sel))
    return taken.to_pylist()


def message_stream(paths: list[str], cfg: ReplayConfig | None = None,
                   scn_buckets: int = 64) -> rd.Dataset:
    """Dataset of one JSON envelope line per message, reference-shaped:
    begin / DML (with before+after) / commit per txn, ddl records, and one
    chkpt per commit-SCN bucket. Ordered within each bucket by
    (commit_scn, kind, scn, scn_idx)."""
    cfg = cfg or ReplayConfig()
    control = load_control(paths)
    lo, hi = 0, max(1, control.max_commit_scn)
    span = max(1, (hi - lo) // scn_buckets + 1)
    bc_ref = ray.put(control.decode_broadcast())

    payload_cols = [n for n, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]

    def decode_keep_images(t: pa.Table) -> pa.Table:
        """Commit-join keeping BOTH images + op letter; PR ops dropped."""
        hashes, cscns, pr_sorted = ray.get(bc_ref)
        keep_ops = pa.array(["I", "U", "D", "DDL"])
        ev = t.filter(pc.is_in(t["op"], value_set=keep_ops))
        if ev.num_rows == 0 or hashes is None or len(hashes) == 0:
            return _empty_decoded()
        xid_h = pd.util.hash_array(np.asarray(
            ev["xid"].to_numpy(zero_copy_only=False), dtype=object))
        if pr_sorted is not None and len(pr_sorted):
            keys = mix_pr_keys(xid_h,
                               ev["scn"].to_numpy(zero_copy_only=False),
                               ev["scn_idx"].to_numpy(zero_copy_only=False))
            ppos = np.clip(np.searchsorted(pr_sorted, keys), 0,
                           len(pr_sorted) - 1)
            undone = pr_sorted[ppos] == keys
            if undone.any():
                ev = ev.take(pa.array(np.flatnonzero(~undone)))
                xid_h = xid_h[~undone]
        if ev.num_rows == 0:
            return _empty_decoded()
        pos = np.clip(np.searchsorted(hashes, xid_h), 0, len(hashes) - 1)
        found = hashes[pos] == xid_h
        commit_scn = cscns[pos]
        if not found.all():
            sel = pa.array(np.flatnonzero(found))
            ev = ev.take(sel)
            commit_scn = commit_scn[found]
        if ev.num_rows == 0:
            return _empty_decoded()
        bucket = ((commit_scn - lo) // span).astype(np.int32)
        return pa.table({
            "scn_bucket": pa.array(bucket),
            "commit_scn": pa.array(commit_scn, pa.int64()),
            "scn": ev["scn"], "scn_idx": ev["scn_idx"].cast(pa.int64()),
            "xid": ev["xid"], "op": ev["op"],
            "table_name": ev["table_name"],
            "conv_id": ev["conv_id"], "turn_idx": ev["turn_idx"],
            "before": ev["before"], "after": ev["after"],
            "changed_mask": ev["changed_mask"],
            "ddl": ev["ddl"],
        })

    def _empty_decoded() -> pa.Table:
        img = S.image_struct(S.MAX_SCHEMA_VERSION)
        return pa.table({
            "scn_bucket": pa.array([], pa.int32()),
            "commit_scn": pa.array([], pa.int64()),
            "scn": pa.array([], pa.int64()), "scn_idx": pa.array([], pa.int64()),
            "xid": pa.array([], pa.string()), "op": pa.array([], pa.string()),
            "table_name": pa.array([], pa.string()),
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "before": pa.array([], img), "after": pa.array([], img),
            "changed_mask": pa.array([], pa.int32()),
            "ddl": pa.array([], pa.string()),
        })

    def to_messages(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket → envelope lines. Synthesizes begin/commit per txn in
        the bucket (a txn's DMLs all share its commit_scn, hence its bucket)
        and a closing chkpt (BuilderJson.cpp:680)."""
        g = g.sort_values(["commit_scn", "scn", "scn_idx"], kind="stable")
        bucket = int(g["scn_bucket"].iloc[0])
        out_scn, out_idx, out_msg = [], [], []

        def emit(c_scn: int, order_idx: int, obj: dict) -> None:
            out_scn.append(c_scn)
            out_idx.append(order_idx)
            out_msg.append(json.dumps(obj, ensure_ascii=False, default=str))

        op_letter = {"I": "c", "U": "u", "D": "d"}
        for (xid, c_scn), txn in g.groupby(["xid", "commit_scn"], sort=True):
            c_idx = 0
            emit(c_scn, c_idx, {
                "c_scn": int(c_scn), "c_idx": c_idx, "xid": xid,
                "payload": [{"op": "begin"}]})
            for r in txn.itertuples():
                c_idx += 1
                if r.op == "DDL":
                    emit(c_scn, c_idx, {
                        "c_scn": int(c_scn), "c_idx": c_idx, "xid": xid,
                        "scn": int(r.scn),
                        "payload": [{"op": "ddl", "sql": r.ddl}]})
                    continue
                body = {
                    "op": op_letter[r.op],
                    "schema": {"owner": "OLR", "table": r.table_name},
                    "rid": f"{r.conv_id}/{int(r.turn_idx)}",
                }
                # undo image on u/d (Builder.h:153-158; BuilderJson appendBefore)
                if r.op in ("U", "D"):
                    body["before"] = r.before
                if r.op in ("I", "U"):
                    body["after"] = r.after
                emit(c_scn, c_idx, {
                    "c_scn": int(c_scn), "c_idx": c_idx, "xid": xid,
                    "scn": int(r.scn), "payload": [body]})
            emit(c_scn, _COMMIT_IDX, {
                "c_scn": int(c_scn), "c_idx": c_idx + 1, "xid": xid,
                "payload": [{"op": "commit"}]})
        # checkpoint record closing the bucket
        max_scn = int(g["commit_scn"].max())
        emit(max_scn, _CHKPT_IDX, {
            "c_scn": max_scn,
            "payload": [{"op": "chkpt", "seq": bucket, "scn": max_scn}]})
        df = pd.DataFrame({"c_scn": out_scn, "order_idx": out_idx,
                           "scn_bucket": bucket, "msg": out_msg})
        return df.sort_values(["c_scn", "order_idx"], kind="stable")

    ds = rd.read_parquet(paths, columns=MESSAGE_COLUMNS,
                         override_num_blocks=cfg.resolved_read_blocks())
    return (ds.map_batches(decode_keep_images, batch_format="pyarrow",
                           batch_size=cfg.batch_size)
              .groupby("scn_bucket")
              .map_groups(to_messages, batch_format="pandas"))


def write_message_stream(paths: list[str], out_dir: str,
                         cfg: ReplayConfig | None = None) -> int:
    """NDJSON sink (WriterFile analog); one file per commit-SCN bucket."""
    ds = message_stream(paths, cfg)
    ds.select_columns(["msg"]).write_json(out_dir)
    return ds.count()
