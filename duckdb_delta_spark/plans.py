"""Connect-safe access to a DataFrame's physical-plan text.

Classic PySpark sessions expose the JVM ``QueryExecution`` through
``df._jdf``; Spark Connect DataFrames have no ``_jdf`` at all, so every
direct ``df._jdf.queryExecution()...`` call is a crash under Connect.
This module is the single seam for the plan-reading surface:

* :func:`jdf_or_none` — the classic JVM handle, or ``None`` under
  Connect (and the one function tests monkeypatch to simulate a
  Connect session against a classic build).
* :func:`physical_plan_text` — executed-plan text via the JVM when
  available, else captured ``df.explain()`` output (Connect serves
  explain through the server, so the fallback works everywhere).

The plan-ASSERTING registry queries (tpcds broadcast-join checks) go
through :func:`physical_plan_text`; the writer's nondeterminism guard
goes through :func:`jdf_or_none` and falls back to a textual predicate
scan (see ``delta/writer.py:_plan_all_deterministic``). Neither path
silently no-ops: under Connect the assertions still run against real
plan text, and the guard still scans the predicate source.
"""

from __future__ import annotations

import contextlib
import io


def jdf_or_none(df):
    """``df._jdf`` on a classic session, ``None`` under Spark Connect.

    The single seam every JVM-plan consumer in this package routes
    through — monkeypatching this to ``lambda df: None`` simulates a
    Connect session end-to-end (tests/test_r20_fixes.py)."""
    return getattr(df, "_jdf", None)


def physical_plan_text(df) -> str:
    """Physical-plan text of ``df``, never raising for a missing JVM
    surface.

    Classic: ``queryExecution().executedPlan().toString()`` — the same
    string the plan assertions have always matched. Connect (or any
    ``_jdf`` failure): captured ``df.explain()`` output, which prints
    the physical plan (AdaptiveSparkPlan + the initial plan) and
    contains the same operator names (``BroadcastHashJoin`` etc.)."""
    jdf = jdf_or_none(df)
    if jdf is not None:
        try:
            return jdf.queryExecution().executedPlan().toString()
        except Exception:
            pass
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()
