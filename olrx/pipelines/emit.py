"""JSON message-stream emitter — the BuilderJson / WriterFile analog.

The reference's primary output is a newline-delimited JSON stream of
transaction envelopes (header: scn/c_scn/c_idx/tm/xid + payload op array —
/root/reference/src/builder/BuilderJson.cpp:452-688, golden sample
/root/reference/tests/fixtures/expected/example-free-23/output.json). The
north-rule target here is the lake table; this emitter provides the stream
form for consumers that want reference-shaped messages (debug sink analog of
``WriterFile``, /root/reference/src/writer/WriterFile.cpp:56-321).

Partitioned by commit-SCN range (not by conv), so each output file is a
contiguous, internally ordered slice of the global commit order — the
closest distributed equivalent of the reference's single totally-ordered
stream. Consumers needing the total order read files in range order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from olrx.pipelines.replay import ReplayConfig, _decoded_events
from olrx.stages.decode import OP_LETTER, load_control


def message_stream(paths: list[str], cfg: ReplayConfig | None = None,
                   scn_buckets: int = 64) -> rd.Dataset:
    """Dataset of one JSON line per committed DML op, ordered within each
    commit-SCN bucket by (commit_scn, scn, scn_idx)."""
    cfg = cfg or ReplayConfig()
    control = load_control(paths)
    lo, hi = 0, max(1, control.max_commit_scn)
    span = max(1, (hi - lo) // scn_buckets + 1)
    events = _decoded_events(paths, cfg, control)

    def bucketize(t: pa.Table) -> pa.Table:
        b = ((t["commit_scn"].to_numpy(zero_copy_only=False) - lo) // span)
        return t.append_column("scn_bucket", pa.array(b.astype(np.int32)))

    def to_messages(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["commit_scn", "scn", "scn_idx"], kind="stable")
        ops = OP_LETTER.to_pylist()
        payload = []
        for r in g.itertuples():
            body = {
                "op": ops[r.op_code].lower(),
                "schema": {"table": "transcripts"},
                "rid": f"{r.conv_id}/{r.turn_idx}",
                "after": {
                    "conv_id": r.conv_id, "turn_idx": int(r.turn_idx),
                    "role": r.v_role, "text": r.v_text, "tool": r.v_tool,
                    "tool_meta": r.v_tool_meta,
                },
            }
            payload.append(body)
        import json
        return pd.DataFrame({
            "c_scn": g["commit_scn"].to_numpy(),
            "scn": g["scn"].to_numpy(),
            "c_idx": g["scn_idx"].to_numpy(),
            "scn_bucket": g["scn_bucket"].to_numpy(),
            "msg": [json.dumps({"c_scn": int(c), "scn": int(s), "c_idx": int(i),
                                "payload": [p]}, ensure_ascii=False)
                    for c, s, i, p in zip(g["commit_scn"], g["scn"],
                                          g["scn_idx"], payload)],
        })

    return (events.map_batches(bucketize, batch_format="pyarrow")
                  .groupby("scn_bucket")
                  .map_groups(to_messages, batch_format="pandas"))


def write_message_stream(paths: list[str], out_dir: str,
                         cfg: ReplayConfig | None = None) -> int:
    """NDJSON sink (WriterFile analog); one file per commit-SCN bucket."""
    ds = message_stream(paths, cfg)
    ds.select_columns(["msg"]).write_json(out_dir)
    return ds.count()
