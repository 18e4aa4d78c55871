"""SQL WHERE-clause → manifest-skipping predicate trees.

The reference accepts its pushdown configuration as plain strings on the
table function (``delta_scan(path, pushdown_filters='all')``,
delta_scan.cpp:113; mode dispatch delta_multi_file_reader.cpp:303-305) and
builds its kernel predicates from the engine's parsed WHERE clause
(PredicateVisitor, delta_utils.cpp:981-1098). Spark-side, users hold WHERE
clauses as SQL strings too — this module parses the pushable subset
directly into :class:`Pred` / :class:`OrPred` trees so a caller can write

    table.scan(spark).filter_sql("d < DATE '2024-01-01' OR d >= '2025-01-01'")

and get manifest-level file skipping (union-of-branch masks for OR) plus
exact row-level re-application, without hand-building predicate tuples.

Grammar (case-insensitive keywords)::

    expr      := and_expr (OR and_expr)*
    and_expr  := unit (AND unit)*
    unit      := NOT unit | '(' expr ')' | predicate
    predicate := col (= | == | != | <> | < | <= | > | >=) literal
               | col IS [NOT] NULL
               | col IS [NOT] DISTINCT FROM (literal | NULL)
               | col [NOT] IN '(' literal (',' literal)* ')'
               | col [NOT] BETWEEN literal AND literal
               | col [NOT] LIKE 'pattern'
    literal   := number | 'string' | TRUE | FALSE
               | DATE 'yyyy-mm-dd' | TIMESTAMP 'yyyy-mm-dd hh:mm:ss[.ffffff]'
    col       := word ('.' word)*           -- dotted struct paths

The result is a CONJUNCTION list: plain :class:`Pred` for each top-level
AND conjunct, :class:`OrPred` (DNF) for disjunctive subtrees. ``NOT`` is
pushed to the leaves by De Morgan; ``NOT IN`` / ``NOT BETWEEN`` expand to
conjunctions of negated children. Anything outside the grammar raises
``ValueError`` — the caller decides whether to fall back to row-level-only
filtering, we never silently mis-prune.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')            # 'quoted string' ('' escape)
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)
      | (?P<bq>`[^`]+`(?:\.`[^`]+`)*)      # `quoted`.`path`
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "is", "null", "in", "between", "true",
             "false", "date", "timestamp", "like", "distinct", "from"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip() == "":
                break
            raise ValueError(f"cannot tokenize WHERE clause at: {s[i:]!r}")
        i = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "word" and text.lower() in _KEYWORDS:
            out.append(("kw", text.lower()))
        elif kind == "bq":
            out.append(("word", text.replace("`", "")))
        else:
            out.append((kind, text))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.pos = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WHERE clause")
        self.pos += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (text is not None and v != text):
            raise ValueError(f"expected {text or kind}, got {v!r}")
        return v

    # ---- boolean tree (returned as ("pred", col, op, value) /
    #      ("and"|"or", children) / ("not", child)) ----

    def expr(self):
        node = self.and_expr()
        children = [node]
        while (t := self.peek()) and t == ("kw", "or"):
            self.next()
            children.append(self.and_expr())
        return ("or", children) if len(children) > 1 else node

    def and_expr(self):
        node = self.unit()
        children = [node]
        while (t := self.peek()) and t == ("kw", "and"):
            self.next()
            children.append(self.unit())
        return ("and", children) if len(children) > 1 else node

    def unit(self):
        t = self.peek()
        if t == ("kw", "not"):
            self.next()
            return ("not", self.unit())
        if t is not None and t[0] == "lpar":
            self.next()
            node = self.expr()
            self.expect("rpar")
            return node
        return self.predicate()

    def predicate(self):
        k, col = self.next()
        if k != "word":
            raise ValueError(f"expected column name, got {col!r}")
        t = self.peek()
        if t is None:
            raise ValueError(f"dangling column {col!r}")
        if t == ("kw", "is"):
            self.next()
            neg = False
            if self.peek() == ("kw", "not"):
                self.next()
                neg = True
            if self.peek() == ("kw", "distinct"):
                # null-safe compare, rewritten onto existing ops (the
                # literal is never NULL in this grammar):
                #   IS NOT DISTINCT FROM v  ≡  col = v AND col IS NOT NULL
                #   IS DISTINCT FROM v      ≡  col != v OR col IS NULL
                # The IS NOT NULL conjunct is redundant in positive
                # position ('=' already drops NULLs) but load-bearing
                # under NOT: De Morgan needs it so the negation comes out
                # as `!= v OR IS NULL`. A bare '=' would negate to '!=',
                # which also drops NULL rows — a silent wrong answer
                # (fuzz-caught: NOT (i IS NOT DISTINCT FROM 0)).
                self.next()
                self.expect("kw", "from")
                if self.peek() == ("kw", "null"):
                    # NULL literal: IS NOT DISTINCT FROM NULL ≡ IS NULL,
                    # IS DISTINCT FROM NULL ≡ IS NOT NULL — both already
                    # self-negating leaves, so NOT needs no special case
                    self.next()
                    return ("pred", col,
                            "is null" if neg else "is not null", None)
                v = self.literal()
                if neg:
                    return ("and", [("pred", col, "=", v),
                                    ("pred", col, "is not null", None)])
                return ("or", [("pred", col, "!=", v),
                               ("pred", col, "is null", None)])
            self.expect("kw", "null")
            return ("pred", col, "is not null" if neg else "is null", None)
        negate = False
        if t == ("kw", "not"):
            self.next()
            negate = True
            t = self.peek()
        if t == ("kw", "in"):
            self.next()
            self.expect("lpar")
            vals = [self.literal()]
            while self.peek() and self.peek()[0] == "comma":
                self.next()
                vals.append(self.literal())
            self.expect("rpar")
            node = ("pred", col, "in", vals)
            return ("not", node) if negate else node
        if t == ("kw", "between"):
            self.next()
            lo = self.literal()
            self.expect("kw", "and")
            hi = self.literal()
            node = ("and", [("pred", col, ">=", lo), ("pred", col, "<=", hi)])
            return ("not", node) if negate else node
        if t == ("kw", "like"):
            self.next()
            pat = self.literal()
            if not isinstance(pat, str):
                raise ValueError("LIKE needs a string pattern")
            node = _like_node(col, pat)
            return ("not", node) if negate else node
        if negate:
            raise ValueError(f"NOT must precede IN/BETWEEN/LIKE after {col!r}")
        if t[0] != "op":
            raise ValueError(f"expected operator after {col!r}, got {t[1]!r}")
        op = self.next()[1]
        return ("pred", col, op, self.literal())

    def literal(self) -> Any:
        k, v = self.next()
        if k == "num":
            return float(v) if ("." in v or "e" in v.lower()) else int(v)
        if k == "str":
            return v[1:-1].replace("''", "'")
        if k == "kw" and v in ("true", "false"):
            return v == "true"
        if k == "kw" and v in ("date", "timestamp"):
            sk, sv = self.next()
            if sk != "str":
                raise ValueError(f"{v.upper()} needs a quoted literal")
            raw = sv[1:-1]
            if v == "date":
                return _dt.date.fromisoformat(raw)
            return _dt.datetime.fromisoformat(raw.replace("T", " "))
        raise ValueError(f"expected literal, got {v!r}")


_NEG = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<",
        "is null": "is not null", "is not null": "is null",
        "like": "not like", "not like": "like"}

_WILD = re.compile(r"[%_]")


def _prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string > every string starting with ``prefix``:
    increment the last incrementable code point (UTF-8 encoding
    preserves code-point order, so the bound holds byte-wise — the
    collation Spark's UTF8String and DuckDB both compare in)."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            nxt = c + 1
            if 0xD800 <= nxt <= 0xDFFF:  # unpaired surrogates: skip past
                nxt = 0xE000
            return prefix[: i] + chr(nxt)
    return None


def _like_node(col: str, pat: str):
    """LIKE compiles to the exact row-level predicate PLUS sound derived
    range companions for the literal prefix (delta-spark's startsWith
    data-skipping rewrite): ``LIKE 'abc%d'`` ⇒ like AND col >= 'abc' AND
    col < 'abd'. No wildcards at all ⇒ plain equality. The companions
    are implied by the like, so conjoining them never changes results —
    they exist purely so the manifest pruner has something to bite on."""
    if "\\" in pat:
        # escape sequences change what the literal prefix IS — deriving
        # one naively from the raw pattern would mis-prune (e.g.
        # 'ab\\%c%' matches strings starting "ab%c", which sort BELOW
        # the raw prefix 'ab\\'); row-level only
        return ("pred", col, "like", pat)
    if not _WILD.search(pat):
        return ("pred", col, "=", pat)
    preds = [("pred", col, "like", pat)]
    prefix = pat[: _WILD.search(pat).start()]
    if prefix:
        preds.append(("pred", col, ">=", prefix))
        ub = _prefix_upper_bound(prefix)
        if ub is not None:
            preds.append(("pred", col, "<", ub))
    return ("and", preds) if len(preds) > 1 else preds[0]

#: DNF expansion guard — (a1 OR … OR a8) AND (b1 OR … OR b8) is 64
#: branches; past this the predicate is too wide to evaluate per-file
MAX_DNF_BRANCHES = 64


def _push_not(node):
    """De Morgan to the leaves. NOT IN expands to a conjunction of !=."""
    kind = node[0]
    if kind == "pred":
        _, col, op, val = node
        if op == "in":
            return ("and", [("pred", col, "!=", v) for v in val])
        return ("pred", col, _NEG[op], val)
    if kind == "not":
        return _normalize(node[1])
    _, children = node
    flipped = "or" if kind == "and" else "and"
    return (flipped, [_push_not(c) for c in children])


def _normalize(node):
    kind = node[0]
    if kind == "pred":
        return node
    if kind == "not":
        return _push_not(node[1])
    _, children = node
    return (kind, [_normalize(c) for c in children])


def _to_dnf(node) -> list[list[tuple]]:
    """Boolean tree → list of AND-branches of leaf preds."""
    kind = node[0]
    if kind == "pred":
        return [[node]]
    if kind == "or":
        out: list[list[tuple]] = []
        for c in node[1]:
            out.extend(_to_dnf(c))
            if len(out) > MAX_DNF_BRANCHES:
                raise ValueError("predicate too wide to push down (DNF > "
                                 f"{MAX_DNF_BRANCHES} branches)")
        return out
    # AND: cross-product of children DNFs
    acc: list[list[tuple]] = [[]]
    for c in node[1]:
        cd = _to_dnf(c)
        acc = [a + b for a in acc for b in cd]
        if len(acc) > MAX_DNF_BRANCHES:
            raise ValueError("predicate too wide to push down (DNF > "
                             f"{MAX_DNF_BRANCHES} branches)")
    return acc


def arrow_mask(table, preds: list):
    """Boolean pyarrow mask (True = keep) evaluating a conjunction list
    of Pred/OrPred over a pyarrow Table — SQL three-valued logic
    collapsed to keep/drop (a NULL comparison drops the row, matching
    WHERE semantics). The executor-side row half of the streaming
    source's ``where`` option; the driver half is per-file pruning via
    scan.file_may_match."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_delta_spark.delta.scan import OrPred

    def col(name: str):
        parts = name.split(".")
        arr = table.column(parts[0])
        for seg in parts[1:]:
            arr = pc.struct_field(arr, seg)
        return arr

    def leaf(p):
        a = col(p.column)
        op = p.op
        if op == "is null":
            return pc.is_null(a)
        if op == "is not null":
            return pc.is_valid(a)
        if op == "in":
            m = pc.is_in(a, value_set=pa.array(list(p.value)))
        elif op == "like":
            m = pc.match_like(a, p.value)
        elif op == "not like":
            m = pc.invert(pc.match_like(a, p.value))
        else:
            fn = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                  ">=": pc.greater_equal, "=": pc.equal,
                  "!=": pc.not_equal}[op]
            m = fn(a, pa.scalar(p.value))
        return pc.fill_null(m, False)

    def node(p):
        if isinstance(p, OrPred):
            out = None
            for br in p.branches:
                bm = None
                for q in br:
                    m = node(q)
                    bm = m if bm is None else pc.and_(bm, m)
                out = bm if out is None else pc.or_(out, bm)
            return out
        return leaf(p)

    mask = None
    for p in preds:
        m = node(p)
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def parse_where(where: str) -> list:
    """Parse a SQL WHERE clause into a conjunction list of
    :class:`~duckdb_delta_spark.delta.scan.Pred` /
    :class:`~duckdb_delta_spark.delta.scan.OrPred`.

    Raises ``ValueError`` on anything outside the pushable grammar."""
    from duckdb_delta_spark.delta.scan import OrPred, Pred

    parser = _Parser(_tokenize(where))
    tree = _normalize(parser.expr())
    if parser.peek() is not None:
        raise ValueError(f"trailing tokens in WHERE clause: "
                         f"{parser.toks[parser.pos:]!r}")

    def leaf(n) -> Pred:
        _, col, op, val = n
        return Pred(col, op, val)

    out: list = []
    conjuncts = tree[1] if tree[0] == "and" else [tree]
    for c in conjuncts:
        if c[0] == "pred":
            out.append(leaf(c))
        elif c[0] == "and":
            # nested AND under top-level AND (e.g. from BETWEEN): flatten
            for cc in c[1]:
                if cc[0] == "pred":
                    out.append(leaf(cc))
                else:
                    out.append(OrPred([[leaf(x) for x in br]
                                       for br in _to_dnf(cc)]))
        else:  # or
            out.append(OrPred([[leaf(x) for x in br] for br in _to_dnf(c)]))
    return out
