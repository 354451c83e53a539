"""Model-evaluation operators over (score, binary-label) columns.

Any scalar signal a pipeline produces — a classifier score, a heuristic
quality permille, one probe dimension of an embedding — gets evaluated
with the same three primitives: ranking power (ROC-AUC), calibration
(reliability table), and operating points (confusion grid).  These are
the reusable cores behind the `embedding_auc`, `return_risk_auc_by_nation`,
`score_calibration`, and `threshold_confusion` registry queries.

Scale design (shared): never rank rows globally.  `roc_auc` reduces n
rows to a per-(group, score) histogram first (one groupBy shuffle with
map-side combine), and the only ordered pass is a cumulative sum over
that histogram — partitioned by group when groups are given, a
single-partition pass over k distinct scores when not (quantize the
score upstream to bound k at very large n).  Doubled average ranks keep
every intermediate an exact BIGINT, so results hash identically under
any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    group_cols: Sequence[str] = (),
    block_expr: "F.Column | None" = None,
) -> DataFrame:
    """Exact tie-aware ROC-AUC via the score-histogram Mann-Whitney form.

    ``pos_col`` must be 0/1.  Returns one row per group (one row total
    when ``group_cols`` is empty) with ``n_pos``, ``n_neg``, ``u2``
    (doubled U statistic, exact BIGINT under average-rank tie handling:
    2U = sum_i pos_i * (2*cumneg_i + neg_i)) and ``auc_permille``
    (integer division; NULL for degenerate single-class groups).

    Grouped calls run the cumulative pass under a PARTITIONED window
    (always parallel).  Ungrouped calls accept ``block_expr`` (monotone
    in the score, e.g. ``F.floor(F.col(score) * 20)``) to route the
    cumulative pass through the two-level blocked decomposition instead
    of a single-partition window — use it whenever the distinct-score
    count is unbounded.
    """
    g = list(group_cols)
    hist = df.groupBy(*g, score_col).agg(
        F.sum(pos_col).cast("bigint").alias("pos_n"),
        F.sum(F.lit(1) - F.col(pos_col)).cast("bigint").alias("neg_n"),
    )
    if not g and block_expr is not None:
        from lakeforge.ops.analytics import blocked_prefix_sum

        cum = blocked_prefix_sum(
            hist, score_col, "neg_n", block_expr, out_col="cumneg"
        )
    else:
        w = (
            Window.partitionBy(*g)
            .orderBy(score_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = hist.withColumn(
            "cumneg",
            F.coalesce(F.sum("neg_n").over(w), F.lit(0)).cast("bigint"),
        )
    agg = cum.groupBy(*g).agg(
        F.sum("pos_n").cast("bigint").alias("n_pos"),
        F.sum("neg_n").cast("bigint").alias("n_neg"),
        F.sum(F.col("pos_n") * (2 * F.col("cumneg") + F.col("neg_n")))
        .cast("bigint")
        .alias("u2"),
    )
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        "u2",
        F.expr(
            "CASE WHEN n_pos > 0 AND n_neg > 0"
            "     THEN (1000 * u2) div (2 * n_pos * n_neg) END"
        )
        .cast("bigint")
        .alias("auc_permille"),
    )


def confusion_grid(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    thresholds: Sequence[int],
) -> DataFrame:
    """Confusion matrix + precision/recall/F1 (integer permille) for the
    ``score >= t`` classifier at each integer threshold.

    One scan: the threshold grid is a constant literal-array explode
    (fan-out |thresholds|, not a join), then one groupBy(threshold)
    shuffle of four partial counts.  F1 uses the 2TP/(2TP+FP+FN) form so
    it stays in integer arithmetic.
    """
    ts = F.array(*[F.lit(int(t)) for t in thresholds])
    e = df.select(score_col, pos_col, F.explode(ts).alias("t"))
    pred = (F.col(score_col) >= F.col("t")).cast("int")
    cells = e.groupBy("t").agg(
        F.sum(pred * F.col(pos_col)).cast("bigint").alias("tp"),
        F.sum(pred * (1 - F.col(pos_col))).cast("bigint").alias("fp"),
        F.sum((1 - pred) * F.col(pos_col)).cast("bigint").alias("fn"),
        F.sum((1 - pred) * (1 - F.col(pos_col))).cast("bigint").alias("tn"),
    )
    return cells.select(
        F.col("t").cast("bigint").alias("threshold_micros"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CASE WHEN tp + fp > 0 THEN (1000 * tp) div (tp + fp) END")
        .cast("bigint")
        .alias("precision_permille"),
        F.expr("CASE WHEN tp + fn > 0 THEN (1000 * tp) div (tp + fn) END")
        .cast("bigint")
        .alias("recall_permille"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn > 0"
            "     THEN (2000 * tp) div (2 * tp + fp + fn) END"
        )
        .cast("bigint")
        .alias("f1_permille"),
    )


def calibration_table(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    bins_per_unit: int = 20,
) -> DataFrame:
    """Reliability table: fixed-width score bins (floor(score *
    bins_per_unit)), per-bin trials, positives, observed positive rate
    (integer permille) and the exact bin score mass in micro units —
    what an ECE / reliability-diagram computation consumes.

    Single groupBy(bin) shuffle; all-integer outputs (floor(score*1e6)
    summed, never a float mean) hash identically at any partitioning.
    Negative sums are emitted raw rather than divided: integer division
    of negatives differs between engines (Spark `div` truncates toward
    zero, DuckDB `//` floors), so only non-negative quantities ratio.
    """
    s = F.col(score_col).cast("double")
    b = df.select(
        F.floor(s * bins_per_unit).cast("bigint").alias("bin"),
        F.col(pos_col).alias("pos"),
        F.floor(s * 1000000).cast("bigint").alias("micros"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.expr("(1000 * sum(pos)) div count(1)")
            .cast("bigint")
            .alias("pos_permille"),
            F.sum("micros").cast("bigint").alias("sum_score_micros"),
        )
        .orderBy("bin")
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    block_expr: "F.Column",
) -> DataFrame:
    """Full precision-recall curve: one row per distinct score cut s with
    the exact TP/FP of the ``score >= s`` classifier and integer-permille
    precision/recall — the complete table behind any PR plot or
    average-precision computation, produced without a global sort.

    TP at an inclusive cut is a SUFFIX count, derived from the exclusive
    prefix counts: tp(s) = n_pos - prefix_pos(s).  Both prefix counts
    come from ONE two-level blocked decomposition
    (:func:`lakeforge.ops.analytics.blocked_prefix_sum` with two sum
    columns), and the (n_pos, n_neg) totals attach as a broadcast-scalar
    fan-out.  All outputs are exact integers.
    """
    from lakeforge.ops.analytics import blocked_prefix_sum

    hist = df.groupBy(score_col).agg(
        F.sum(pos_col).cast("bigint").alias("pos_n"),
        F.sum(F.lit(1) - F.col(pos_col)).cast("bigint").alias("neg_n"),
    )
    cum = blocked_prefix_sum(
        hist,
        score_col,
        ["pos_n", "neg_n"],
        block_expr,
        out_col=["cum_pos", "cum_neg"],
    )
    totals = hist.agg(
        F.sum("pos_n").cast("bigint").alias("n_pos"),
        F.sum("neg_n").cast("bigint").alias("n_neg"),
    )
    j = cum.crossJoin(F.broadcast(totals))
    return j.select(
        F.col(score_col).alias("score_cut"),
        (F.col("n_pos") - F.col("cum_pos")).cast("bigint").alias("tp"),
        (F.col("n_neg") - F.col("cum_neg")).cast("bigint").alias("fp"),
        F.expr("(1000 * (n_pos - cum_pos)) div ((n_pos - cum_pos) + (n_neg - cum_neg))")
        .cast("bigint")
        .alias("precision_permille"),
        F.expr(
            "CASE WHEN n_pos > 0"
            "     THEN (1000 * (n_pos - cum_pos)) div n_pos END"
        )
        .cast("bigint")
        .alias("recall_permille"),
    )
