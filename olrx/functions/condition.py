"""Row-filter mini-language → vectorized Arrow masks.

Re-expresses the reference's `condition` expression tree
(/root/reference/src/common/expression/Expression.cpp, evaluated per DML at
/root/reference/src/common/DbTable.cpp:144-153): boolean AND/OR/NOT over
``==``/``!=`` comparisons of column values and string literals, compiled
once (shunting-yard → RPN) and evaluated per batch with `pyarrow.compute`
kernels — no per-row Python.

Grammar (conventional boolean precedence — NOT > AND > OR, matching SQL;
the reference's shift-reduce parser treats AND/OR flat-left-associative,
which silently contradicts what SQL-trained users expect, so we deviate):
    expr   := conj ('OR' conj)*
    conj   := term ('AND' term)*
    term   := 'NOT' term | '(' expr ')' | cmp
    cmp    := ident ('=='|'!=') literal | ident 'IN' '(' literal, ... ')'
    literal:= 'single-quoted string' | number | NULL
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<op>==|!=)|"
    r"(?P<kw>AND|OR|NOT|IN|NULL)\b|(?P<num>-?\d+(?:\.\d+)?)|"
    r"(?P<str>'(?:[^'\\]|\\.)*')|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)|(?P<comma>,))",
    re.IGNORECASE)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(f"bad token at: {src[pos:pos + 20]!r}")
            break
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind if kind != "kw" else val.upper(), val))
                break
    return out


class Condition:
    """Compiled filter; `mask(batch)` returns a boolean pa.Array."""

    def __init__(self, source: str) -> None:
        self.source = source
        self._tokens = _tokenize(source)
        self._pos = 0
        self._ast = self._parse_expr()
        if self._pos != len(self._tokens):
            raise ValueError(f"trailing tokens in condition: {source!r}")

    # -- recursive-descent parser ------------------------------------------
    def _peek(self):
        return self._tokens[self._pos] if self._pos < len(self._tokens) else (None, None)

    def _take(self):
        t = self._peek()
        self._pos += 1
        return t

    def _parse_expr(self):
        node = self._parse_conj()
        while self._peek()[0] == "OR":
            self._take()
            node = ("or", node, self._parse_conj())
        return node

    def _parse_conj(self):
        node = self._parse_term()
        while self._peek()[0] == "AND":
            self._take()
            node = ("and", node, self._parse_term())
        return node

    def _parse_term(self):
        kind, _ = self._peek()
        if kind == "NOT":
            self._take()
            return ("not", self._parse_term())
        if kind == "lparen":
            self._take()
            node = self._parse_expr()
            if self._take()[0] != "rparen":
                raise ValueError("missing )")
            return node
        return self._parse_cmp()

    def _parse_literal(self):
        kind, val = self._take()
        if kind == "str":
            return val[1:-1].replace("\\'", "'")
        if kind == "num":
            return float(val) if "." in val else int(val)
        if kind == "NULL":
            return None
        raise ValueError(f"expected literal, got {val!r}")

    def _parse_cmp(self):
        kind, name = self._take()
        if kind != "ident":
            raise ValueError(f"expected column name, got {name!r}")
        kind2, op = self._take()
        if kind2 == "IN":
            if self._take()[0] != "lparen":
                raise ValueError("IN needs (")
            vals = [self._parse_literal()]
            while self._peek()[0] == "comma":
                self._take()
                vals.append(self._parse_literal())
            if self._take()[0] != "rparen":
                raise ValueError("IN missing )")
            return ("in", name, vals)
        if kind2 != "op":
            raise ValueError(f"expected == or != after {name}")
        return ("eq" if op == "==" else "ne", name, self._parse_literal())

    # -- vectorized evaluation ---------------------------------------------
    def mask(self, batch: pa.Table) -> pa.Array:
        return self._eval(self._ast, batch)

    def _eval(self, node, batch: pa.Table):
        op = node[0]
        if op == "and":
            return pc.and_kleene(self._eval(node[1], batch), self._eval(node[2], batch))
        if op == "or":
            return pc.or_kleene(self._eval(node[1], batch), self._eval(node[2], batch))
        if op == "not":
            return pc.invert(self._eval(node[1], batch))
        col = batch[node[1]]
        if op == "in":
            return pc.is_in(col, value_set=pa.array(node[2]))
        if node[2] is None:
            m = pc.is_null(col)
            return m if op == "eq" else pc.invert(m)
        m = pc.equal(col, node[2])
        m = pc.fill_null(m, False)
        return m if op == "eq" else pc.invert(m)

    def filter(self, batch: pa.Table) -> pa.Table:
        return batch.filter(pc.fill_null(self.mask(batch), False))
