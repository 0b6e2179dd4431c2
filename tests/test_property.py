"""Property-based check: merge_apply ≡ naive dict apply on arbitrary streams.

Hypothesis generates arbitrary (not chain-valid) event sets — including
updates on missing rows, deletes of absent keys, equal order keys — and the
vectorized kernel must match a 10-line dict interpretation of the SURVEY
§7.1 semantics exactly.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from olrx import schema as S
from olrx.stages.apply import merge_apply

N_COLS = len(S.payload_columns(1))

event = st.tuples(
    st.integers(0, 3),               # conv index
    st.integers(0, 2),               # turn
    st.sampled_from([0, 1, 2]),      # op code I/U/D
    st.integers(0, 5),               # commit_scn
    st.integers(0, 5),               # scn
    st.integers(0, 3),               # scn_idx
    st.integers(1, (1 << N_COLS) - 1),  # changed mask (nonzero)
    st.one_of(st.none(), st.text("abc", min_size=0, max_size=3)),  # text value
)


def dict_apply(events):
    """Reference semantics, dict-at-a-time."""
    names = [n for n, _ in S.payload_columns(1)]
    state = {}
    for conv, turn, op, cscn, scn, sidx, mask, text in sorted(
            events, key=lambda e: (e[0], e[1], e[3], e[4], e[5])):
        key = (conv, turn)
        if op == 2:
            state.pop(key, None)
            continue
        vals = {}
        for i, nm in enumerate(names):
            if op == 0 or (mask >> i) & 1:
                vals[nm] = f"{nm}:{text}" if text is not None else None
        if op == 0:  # insert replaces wholesale (full image: all cols set)
            row = {nm: vals.get(nm) for nm in names}
            state[key] = row
        else:
            row = state.setdefault(key, {nm: None for nm in names})
            row.update(vals)
    return state


def to_table(events):
    names = [n for n, _ in S.payload_columns(1)]
    cols = {
        "conv_id": pa.array([f"c{e[0]}" for e in events]),
        "turn_idx": pa.array([e[1] for e in events], pa.int32()),
        "op_code": pa.array([e[2] for e in events], pa.int8()),
        "commit_scn": pa.array([e[3] for e in events], pa.int64()),
        "scn": pa.array([e[4] for e in events], pa.int64()),
        "scn_idx": pa.array([e[5] for e in events], pa.int32()),
        # I events carry the full mask (full image), like the decode layer
        "changed_mask": pa.array(
            [S.full_mask(1) if e[2] == 0 else e[6] for e in events], pa.int32()),
    }
    for i, nm in enumerate(names):
        vals = []
        for e in events:
            mask = S.full_mask(1) if e[2] == 0 else e[6]
            if e[2] != 2 and (mask >> i) & 1 and e[7] is not None:
                vals.append(f"{nm}:{e[7]}")
            else:
                vals.append(None)
        t = pa.timestamp("us") if nm == "ts" else pa.string()
        if nm == "ts":
            cols[f"v_{nm}"] = pa.array(
                [None if v is None else len(v) for v in vals], pa.int64()
            ).cast(t)
        else:
            cols[f"v_{nm}"] = pa.array(vals, pa.string())
    return pa.table(cols)


@settings(max_examples=200, deadline=None)
@given(st.lists(event, min_size=0, max_size=40, unique_by=lambda e: (e[0], e[1], e[3], e[4], e[5])))
def test_merge_matches_dict_apply(events):
    got = merge_apply(to_table(events), 1)
    expect = dict_apply(events)
    got_rows = {(r["conv_id"], r["turn_idx"]): r for r in got.to_pylist()}
    assert set(got_rows) == {(f"c{c}", t) for c, t in expect}
    names = [n for n, _ in S.payload_columns(1) if n != "ts"]
    for (conv, turn), row in expect.items():
        g = got_rows[(f"c{conv}", turn)]
        for nm in names:
            assert g[nm] == row[nm], ((conv, turn), nm, g, row)


@settings(max_examples=120, deadline=None)
@given(st.lists(event, min_size=0, max_size=40,
                unique_by=lambda e: (e[0], e[1], e[3], e[4], e[5])),
       st.integers(0, 3))
def test_compaction_preserves_merge(events, split_at):
    """merge(compact(A) + B) == merge(A + B): compaction is a semigroup fold."""
    from olrx.stages.apply import compact_events

    t = to_table(events)
    cut = (len(events) * split_at) // 4
    a, b = t.slice(0, cut), t.slice(cut)
    merged_plain = merge_apply(t, 1)
    compacted = compact_events(a)
    recombined = pa.concat_tables([compacted, b], promote_options="default")
    merged_compacted = merge_apply(recombined, 1)
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert merged_compacted.sort_by(key).equals(merged_plain.sort_by(key))
