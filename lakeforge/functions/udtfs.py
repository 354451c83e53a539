"""Python user-defined table functions (Spark 4 `@udtf` API surface).

Like the grouped-agg pandas UDAF demo (workload_rel.geo_mean_price_udaf),
this module exists to cover an API surface with a NON-headline example:
per-row sequential logic that expands one row into many.  The headline
path for anything expressible as explode/window stays JVM-side; a UDTF is
the right tool when the expansion needs stateful per-row scanning that
would otherwise take a window-over-explode detour.

`TokenRuns` run-length-encodes a document's token stream in one linear
pass per row.  The relational equivalent is a gaps-and-islands window
over posexplode output (explode -> lag -> cumulative sum -> group), i.e.
a shuffle of every token; the UDTF keeps the scan inside the row.  The
DuckDB oracle (workload_llm) IS that gaps-and-islands formulation, so the
two independent formulations check each other.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="run_idx bigint, token string, run_len bigint, start_pos bigint")
class TokenRuns:
    """(doc text) -> one row per maximal run of consecutive equal tokens.

    start_pos is the 0-based token index where the run begins; run_idx
    numbers runs from 0.  Tokenization matches llm/text.py::tokens_col
    (lowercase, whitespace split, empties dropped)."""

    def eval(self, text: str):  # noqa: D102 — schema above
        if text is None:
            return
        toks = [t for t in text.lower().split() if t]
        run_idx = 0
        i = 0
        n = len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            yield run_idx, toks[i], j - i, i
            run_idx += 1
            i = j
