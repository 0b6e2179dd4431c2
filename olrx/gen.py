"""Deterministic synthetic change-log generator (seeded; no external data).

Mirrors the reference's test-fixture strategy (captured redo logs + golden
output, /root/reference/tests/README.md:1-55) with a vectorized numpy
generator instead of a live Oracle. One call produces a full changelog
(`pyarrow.Table` in the `olrx.schema.changelog_schema()` layout) exercising,
in a single stream, the semantic scenarios of /root/reference/PLAN.md:366-394:

- interleaved transactions (begin order != commit order)
- rollbacks (R-terminated txns produce no table changes,
  /root/reference/src/parser/Transaction.cpp:207-210)
- open transactions at end-of-stream (never emitted)
- updates / deletes / delete-then-reinsert chains per (conv_id, turn_idx)
- a skewed hot conversation (north-rule salting fixture)
- an in-stream DDL adding an additive column at a known SCN
  (/root/reference/src/builder/SystemTransaction.cpp:729)
- multi-shard (RAC redo-thread analog) with per-shard log segments
- special characters / multibyte text passthrough

Event-chain validity is guaranteed by construction: per key the op chain is
``I, U*, [D, [I, U*]]`` and chain order maps to nondecreasing commit order
(strictly increasing ``(commit_scn, scn, scn_idx)``).

Generation is cached on disk under a config digest so the Ray pipeline and
the DuckDB oracle SQL read the *same* parquet bytes.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from olrx import schema as S

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
SCN0 = 1000
SCN_STRIDE = 13          # commit_scn[t] = SCN0 + t * SCN_STRIDE
COMMIT_SCN_IDX = 1 << 20  # C/R events sort after all DML at the same scn

ROLES = np.array(["user", "assistant", "system", "tool"])
SPECIAL_SNIPPETS = [
    "\nline2\t\"quoted\" \\ back",
    " üñïçødé 測試 😀",
    "\r\ncrlf,comma;semi",
]


@dataclass(frozen=True)
class GenConfig:
    """Knobs for the synthetic stream. ``scale`` ~ TPC-H sf: DML event count
    ≈ scale * 6e6 (so sf0.01 ≈ 60k events, matching TESTDATA.md row counts)."""

    scale: float = 0.001
    seed: int = 42
    avg_turns: int = 20
    update_lambda: float = 0.8     # mean updates per key
    delete_ratio: float = 0.10     # P(key deleted after updates)
    reinsert_ratio: float = 0.30   # P(reinsert | deleted)
    txn_avg_events: int = 12
    rollback_frac: float = 0.05    # rolled-back txns, as fraction of committed
    open_txns: int = 2             # dangling txns at end-of-stream
    n_shards: int = 2
    segments_per_shard: int = 4
    hot_conv_factor: int = 0       # conv 0 gets factor*avg_turns turns (skew)
    partial_images: bool = False   # True → U events carry only changed columns
    ddl: bool = True               # emit the add-column DDL mid-stream
    special_char_every: int = 37   # every k-th text gets a special snippet

    @property
    def n_conversations(self) -> int:
        return max(4, int(150_000 * self.scale))

    def digest(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()[:16]


@dataclass
class GenResult:
    table: pa.Table
    ddl_scn: int              # -1 when no DDL
    n_committed_txns: int
    config: GenConfig = field(repr=False, default=None)


def _make_text(ki: np.ndarray, ti: np.ndarray, ver: np.ndarray,
               cfg: GenConfig, rng: np.random.Generator) -> list[str]:
    pad = rng.integers(0, 120, len(ki))
    out = []
    k = cfg.special_char_every
    for i in range(len(ki)):
        t = f"conv{ki[i]}-turn{ti[i]}-v{ver[i]} " + "lorem " * (pad[i] // 6)
        if k and i % k == 0:
            t += SPECIAL_SNIPPETS[(i // k) % len(SPECIAL_SNIPPETS)]
        out.append(t)
    return out


def generate(cfg: GenConfig) -> GenResult:
    rng = np.random.default_rng(cfg.seed)

    # ---- keys and per-key chains -----------------------------------------
    n_conv = cfg.n_conversations
    turns = rng.integers(max(1, cfg.avg_turns // 2), cfg.avg_turns * 2, n_conv)
    if cfg.hot_conv_factor > 1:
        turns[0] = cfg.avg_turns * cfg.hot_conv_factor
    n_keys = int(turns.sum())
    key_conv = np.repeat(np.arange(n_conv), turns)           # conv index per key
    key_turn = np.concatenate([np.arange(t) for t in turns]).astype(np.int64)

    n_upd = rng.poisson(cfg.update_lambda, n_keys)
    deleted = rng.random(n_keys) < cfg.delete_ratio
    reins = deleted & (rng.random(n_keys) < cfg.reinsert_ratio)
    n_upd2 = np.where(reins, rng.poisson(0.5, n_keys), 0)
    chain_len = 1 + n_upd + deleted.astype(np.int64) + reins.astype(np.int64) + n_upd2

    total = int(chain_len.sum())
    offs = np.zeros(n_keys + 1, dtype=np.int64)
    np.cumsum(chain_len, out=offs[1:])
    ev_key = np.repeat(np.arange(n_keys), chain_len)
    chain_pos = np.arange(total) - offs[:-1][ev_key]

    # op per chain position: 0→I, 1..n_upd→U, n_upd+1→D, n_upd+2→I, rest→U
    op = np.full(total, "U", dtype=object)
    op[chain_pos == 0] = "I"
    d_at = offs[:-1] + 1 + n_upd
    op[d_at[deleted]] = "D"
    op[(d_at + 1)[reins]] = "I"

    # ---- assign chain events to committed transactions -------------------
    n_txn = max(2, total // cfg.txn_avg_events)
    r = rng.integers(0, n_txn, total)
    s = ev_key * np.int64(n_txn) + r
    s.sort()                                   # per-key ascending txn, blocks preserved
    ev_txn = (s - ev_key * np.int64(n_txn)).astype(np.int64)

    commit_scn = SCN0 + np.arange(n_txn, dtype=np.int64) * SCN_STRIDE
    txn_dur = rng.integers(2, 15 * SCN_STRIDE, n_txn)        # overlap ⇒ interleaving
    begin_scn = commit_scn - txn_dur
    txn_shard = (np.arange(n_txn) % cfg.n_shards).astype(np.int16)

    # intra-txn order: stable sort by txn keeps per-key chain order
    order = np.argsort(ev_txn, kind="stable")
    ev_key, chain_pos, op, ev_txn = ev_key[order], chain_pos[order], op[order], ev_txn[order]
    txn_starts = np.searchsorted(ev_txn, np.arange(n_txn))
    intra = np.arange(total) - txn_starts[ev_txn] + 1        # B is scn_idx 0
    ev_scn = np.minimum(begin_scn[ev_txn] + intra, commit_scn[ev_txn] - 1)

    dml = {
        "ki": key_conv[ev_key], "ti": key_turn[ev_key], "ver": chain_pos,
        "op": op, "txn": ev_txn, "scn": ev_scn, "scn_idx": intra.astype(np.int64),
        "shard": txn_shard[ev_txn], "committed": np.ones(total, bool),
        "commit_scn": commit_scn[ev_txn],
    }

    # ---- rollback + open transactions ------------------------------------
    extras = []
    n_rb = int(n_txn * cfg.rollback_frac)
    aux_specs = [("rb", n_rb, True), ("open", cfg.open_txns, False)]
    fresh_turn = 1_000_000  # keys never used by chains
    aux_txns = []           # (xid, kind, begin, end|None, shard)
    for kind, count, terminated in aux_specs:
        for j in range(count):
            anchor = int(rng.integers(0, n_txn))
            end = int(commit_scn[anchor]) + 4 + j % 7
            dur = int(rng.integers(5, 40))
            k = int(rng.integers(2, 8))
            pick = rng.integers(0, n_keys, k)
            is_ins = rng.random(k) < 0.3
            ki = key_conv[pick].copy()
            ti = key_turn[pick].copy()
            ti[is_ins] = fresh_turn + np.arange(int(is_ins.sum()))
            fresh_turn += k
            extras.append({
                "ki": ki, "ti": ti, "ver": np.full(k, 90 + j),
                "op": np.where(is_ins, "I", "U").astype(object),
                "txn": np.full(k, -1), "scn": np.full(k, end - dur) + np.arange(k) + 1,
                "scn_idx": np.arange(k) + 1,
                "shard": np.full(k, (anchor + 1) % cfg.n_shards, dtype=np.int16),
                "committed": np.zeros(k, bool), "commit_scn": np.full(k, -1),
                "xid": f"{kind}{j:04d}",
            })
            aux_txns.append((f"{kind}{j:04d}", kind, end - dur, end if terminated else None,
                             np.int16((anchor + 1) % cfg.n_shards)))

    # ---- DDL txn ----------------------------------------------------------
    ddl_scn = -1
    if cfg.ddl:
        t_at = int(n_txn * 0.4)
        ddl_scn = int(SCN0 + t_at * SCN_STRIDE + 3)

    # ---- build flat event arrays (chains + extras) ------------------------
    def col(name):
        parts = [dml[name]] + [e[name] for e in extras]
        return np.concatenate(parts)

    ki, ti, ver = col("ki"), col("ti"), col("ver")
    opc, scn, scn_idx = col("op"), col("scn"), col("scn_idx")
    shard, committed, ev_cscn = col("shard"), col("committed"), col("commit_scn")
    n = len(ki)
    xid = np.empty(n, dtype=object)
    xid[:total] = np.char.add("x", ev_txn.astype("U9"))
    pos = total
    for e in extras:
        k = len(e["ki"])
        xid[pos:pos + k] = e["xid"]
        pos += k

    # payload values (deterministic functions of key + version)
    text = _make_text(ki, ti, ver, cfg, rng)
    role = ROLES[ti % 4]
    tool_code = (ki * 31 + ti * 7 + ver * 13) % 10
    tool = np.char.add("tool", (tool_code % 5).astype("U2")).astype(object)
    tool[tool_code < 3] = None
    ev_ts = EPOCH_US + scn * 1_000_000
    post_ddl = (ev_cscn > ddl_scn) if ddl_scn > 0 else np.zeros(n, bool)
    meta_code = (ki * 17 + ti * 3 + ver * 5) % 4
    tool_meta = np.char.add("meta", meta_code.astype("U2")).astype(object)
    tool_meta[~(post_ddl & (meta_code < 2))] = None

    is_i = opc == "I"
    is_u = opc == "U"
    is_d = opc == "D"
    base_bits = S.full_mask(0)
    full_bits = np.where(post_ddl, S.full_mask(1), base_bits).astype(np.int32)
    mask = full_bits.copy()
    if cfg.partial_images:
        # U events: always text; tool with p=.5 (20% of those explicit-null);
        # role never (fixed per key); tool_meta when populated.
        bit_text = 1 << S.column_bit("text")
        bit_tool = 1 << S.column_bit("tool")
        bit_ts = 1 << S.column_bit("ts")
        bit_meta = 1 << S.column_bit("tool_meta")
        upd_tool = is_u & ((ki + ti + ver) % 2 == 0)
        null_tool = upd_tool & ((ki * 3 + ver) % 5 == 0)
        tool = np.where(null_tool, None, tool)
        m = np.where(is_u, bit_text | bit_ts, full_bits)
        m = np.where(upd_tool, m | bit_tool, m)
        m = np.where(is_u & post_ddl & (tool_meta != None), m | bit_meta, m)  # noqa: E711
        mask = m.astype(np.int32)

    # ---- assemble the full row set: DML + control (B/C/R/DDL) rows --------
    ctl_rows = []  # (scn, scn_idx, shard, xid, op, ddl_json)
    for t in range(n_txn):
        ctl_rows.append((int(begin_scn[t]), 0, int(txn_shard[t]), f"x{t}", "B", None))
        ctl_rows.append((int(commit_scn[t]), COMMIT_SCN_IDX, int(txn_shard[t]), f"x{t}", "C", None))
    for xname, kind, b, e, sh in aux_txns:
        ctl_rows.append((b, 0, int(sh), xname, "B", None))
        if e is not None:
            ctl_rows.append((e, COMMIT_SCN_IDX, int(sh), xname, "R", None))
    if ddl_scn > 0:
        payload = json.dumps({"add_columns": [{"name": "tool_meta", "type": "string"}]})
        ctl_rows.append((ddl_scn - 1, 0, 0, "xddl", "B", None))
        ctl_rows.append((ddl_scn, 1, 0, "xddl", "DDL", payload))
        ctl_rows.append((ddl_scn, COMMIT_SCN_IDX, 0, "xddl", "C", None))

    nc = len(ctl_rows)
    c_scn = np.fromiter((r[0] for r in ctl_rows), np.int64, nc)
    c_idx = np.fromiter((r[1] for r in ctl_rows), np.int64, nc)
    c_shard = np.fromiter((r[2] for r in ctl_rows), np.int16, nc)
    c_xid = np.array([r[3] for r in ctl_rows], dtype=object)
    c_op = np.array([r[4] for r in ctl_rows], dtype=object)
    c_ddl = np.array([r[5] for r in ctl_rows], dtype=object)

    def cat(a, b):
        return np.concatenate([a, b])

    all_scn = cat(scn, c_scn)
    all_idx = cat(scn_idx, c_idx)
    all_shard = cat(shard, c_shard)
    all_xid = cat(xid, c_xid)
    all_op = cat(opc, c_op)
    all_ddl = cat(np.full(n, None, dtype=object), c_ddl)
    nan_i32 = np.full(nc, -1, np.int64)
    all_conv = cat(np.char.add("conv", ki.astype("U9")).astype(object),
                   np.full(nc, None, dtype=object))
    all_turn = cat(ti, nan_i32)
    all_mask = cat(mask.astype(np.int64), np.zeros(nc, np.int64))
    all_ts = cat(ev_ts, EPOCH_US + c_scn * 1_000_000)

    key_valid = np.concatenate([np.ones(n, bool), np.zeros(nc, bool)])

    # image struct arrays ---------------------------------------------------
    def image(valid_mask, values_null_when_unset):
        pads = lambda a: np.concatenate([a, np.full(nc, None, dtype=object)])  # noqa: E731
        role_a = pads(role.astype(object))
        text_a = pads(np.array(text, dtype=object))
        tool_a = pads(tool)
        meta_a = pads(tool_meta)
        ts_a = cat(ev_ts, np.zeros(nc, np.int64))
        if values_null_when_unset is not None:
            vm = values_null_when_unset
            bit = lambda nm: np.concatenate([(vm & (1 << S.column_bit(nm))) != 0,  # noqa: E731
                                             np.zeros(nc, bool)])
            role_a = np.where(bit("role"), role_a, None)
            text_a = np.where(bit("text"), text_a, None)
            tool_a = np.where(bit("tool"), tool_a, None)
            meta_a = np.where(bit("tool_meta"), meta_a, None)
        fields = {
            "role": pa.array(role_a, pa.string()),
            "text": pa.array(text_a, pa.string()),
            "tool": pa.array(tool_a, pa.string()),
            "ts": pa.array(ts_a, pa.int64()).cast(pa.timestamp("us")),
            "tool_meta": pa.array(meta_a, pa.string()),
        }
        cols = [fields[nm] for nm, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]
        names = [nm for nm, _ in S.payload_columns(S.MAX_SCHEMA_VERSION)]
        return pa.StructArray.from_arrays(cols, names=names,
                                          mask=pa.array(~valid_mask))

    has_after = np.concatenate([is_i | is_u, np.zeros(nc, bool)])
    has_before = np.concatenate([is_u | is_d, np.zeros(nc, bool)])
    after_arr = image(has_after, mask if cfg.partial_images else None)
    # before image: structurally real (undo-image slot); content mirrors the
    # current version — nothing downstream consumes before-values (SURVEY §2.4)
    before_arr = image(has_before & key_valid, None)

    tbl = pa.table(
        {
            "scn": pa.array(all_scn, pa.int64()),
            "scn_idx": pa.array(all_idx, pa.int64()).cast(pa.int32()),
            "seq": pa.array(np.zeros(n + nc, np.int32)),
            "shard": pa.array(all_shard, pa.int16()),
            "xid": pa.array(all_xid, pa.string()),
            "op": pa.array(all_op, pa.string()),
            "conv_id": pa.array(all_conv, pa.string()),
            "turn_idx": pa.array(np.where(all_turn < 0, None, all_turn)).cast(pa.int32()),
            "before": before_arr,
            "after": after_arr,
            "changed_mask": pa.array(all_mask, pa.int64()).cast(pa.int32()),
            "changed_cols": pa.nulls(n + nc, pa.list_(pa.string())),
            "ddl": pa.array(all_ddl, pa.string()),
            "ts": pa.array(all_ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )

    # redo-stream order within shard: (scn, scn_idx)
    tbl = tbl.sort_by([("shard", "ascending"), ("scn", "ascending"), ("scn_idx", "ascending")])

    # per-shard segment sequence (log file number analog)
    scn_arr = tbl["scn"].to_numpy()
    span = max(1, (int(scn_arr.max()) - SCN0 + 1) // cfg.segments_per_shard + 1)
    seq = ((scn_arr - SCN0).clip(min=0) // span).astype(np.int32)
    tbl = tbl.set_column(tbl.schema.get_field_index("seq"), "seq", pa.array(seq))

    return GenResult(table=tbl, ddl_scn=ddl_scn, n_committed_txns=n_txn, config=cfg)


# ---------------------------------------------------------------------------
# segmented on-disk layout + cache
# ---------------------------------------------------------------------------

def write_segments(res: GenResult, out_dir: str) -> list[str]:
    """Write the changelog as per-(shard, seq) parquet segments — the
    confirmed-progress unit, like an LWN group / archived log file
    (/root/reference/src/parser/Parser.cpp:1403-1439)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = res.table
    shard = tbl["shard"].to_numpy()
    seq = tbl["seq"].to_numpy()
    paths = []
    for sh in np.unique(shard):
        for sq in np.unique(seq[shard == sh]):
            sel = np.flatnonzero((shard == sh) & (seq == sq))
            part = tbl.take(pa.array(sel))
            p = os.path.join(out_dir, f"shard{sh:02d}-seg{sq:04d}.parquet")
            tmp = p + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, p)
            paths.append(p)
    return sorted(paths)


def ensure_changelog(cfg: GenConfig, root: str = "/tmp/olrx_data") -> str:
    """Generate-once cache: returns a directory of segment parquet files for
    this config (both the Ray pipeline and DuckDB oracle read these bytes)."""
    d = os.path.join(root, f"gen-{cfg.digest()}")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    res = generate(cfg)
    os.makedirs(d, exist_ok=True)
    write_segments(res, d)
    meta = {"config": asdict(cfg), "ddl_scn": res.ddl_scn,
            "n_committed_txns": res.n_committed_txns, "rows": res.table.num_rows}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)
    return d


def scale_for_sf_dir(sf_dir: str) -> float:
    """Map a testdata dir like /root/testdata/sf0.01 to a generator scale."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001
