"""Literal array builders that cost ONE py4j round-trip.

``F.array(*[F.lit(x) for x in vals])`` issues 2+ py4j socket round-trips
per element; a 16x16-codeword PQ codebook built that way costs ~2,000
round-trips ≈ 1.7 s of pure driver-side socket chatter per query build
(measured with cProfile: `recv_into` under `pyspark...lit`). The guide's
§5 rule — the driver should do almost no work — applies to plan
CONSTRUCTION too. These helpers render the same literal as one SQL
expression string and hand it to Catalyst in a single ``F.expr`` call;
the parsed result is the same ``CreateArray(Literal...)`` tree, so plans
and results are bit-identical.

Exactness: ``repr(float)`` is the shortest decimal that round-trips to
the same IEEE-754 double, and Spark's parser reads ``...D`` literals with
``Double.parseDouble`` — bit-identical to ``F.lit(x)``. Strings are
escaped for Spark's default backslash-escaped literal syntax.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def sql_double(x: float) -> str:
    """Exact SQL double literal for ``x`` (handles nan/inf)."""
    x = float(x)
    if math.isnan(x) or math.isinf(x):
        return f"CAST('{x}' AS DOUBLE)"
    return repr(x) + "D"


def sql_string(s: str) -> str:
    """SQL string literal. Quotes are escaped by doubling (``''``), which
    both of Spark's parser modes accept; backslashes are doubled for the
    default ``spark.sql.parser.escapedStringLiterals=false`` mode — a
    session running the legacy mode would read them literally, so such a
    string refuses to render rather than silently corrupt."""
    if "\\" in s:
        raise ValueError(
            "sql_string is only exact under the default "
            "escapedStringLiterals=false parser mode for backslashes; "
            "use F.lit for strings containing backslashes"
        )
    return "'" + s.replace("'", "''") + "'"


def lit_doubles(vals) -> Column:
    """``array<double>`` literal in one round-trip."""
    return F.expr("array(" + ",".join(sql_double(v) for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal in one round-trip."""
    body = ",".join(
        "array(" + ",".join(sql_double(v) for v in row) + ")" for row in rows
    )
    return F.expr(f"array({body})")


def lit_strings(vals) -> Column:
    """``array<string>`` literal in one round-trip."""
    return F.expr("array(" + ",".join(sql_string(v) for v in vals) + ")")
