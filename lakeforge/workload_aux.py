"""Round-6 auxiliary workload: privacy depth, sketch calibration,
imputation, interval occupancy, repeated-span dedup, feature hashing, and
graph cores.

Families covered here (none previously in the registry):

- **Privacy depth**: l-diversity on top of the existing k-anonymity
  release — a group can be k-large yet reveal everyone's sensitive value
  if that value is constant; the l-gate requires >= l DISTINCT sensitive
  values per quasi-identifier group.
- **Sketch calibration**: a count-min sketch (Cormode & Muthukrishnan
  2005) built map-side over the raw fact rows, with the estimate-vs-exact
  overcount audited per item — CMS complements the existing KMV/HLL/Bloom/
  KLL family (point-frequency estimates, mergeable counters).
- **Imputation**: LOCF (last-observation-carried-forward) gap fill of a
  per-key monthly series over a dense spine — the standard time-series
  repair before any ML feature extraction.
- **Interval occupancy**: interval x calendar-bucket overlap aggregate
  (in-transit days per supplier-month) via bounded month explode — the
  resource-occupancy rollup shape (no sweep line, no global sort).
- **Repeated-span detection**: the ExactSubstr training-data dedup
  primitive (Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better"): positional n-grams repeated ACROSS documents, merged
  into maximal per-document spans via gaps-and-islands.
- **Feature hashing**: the hashing-trick categorical encoder (Weinberger
  et al. 2009) with signed buckets and explicit collision accounting.
- **Graph cores**: k-core decomposition by synchronized peeling rounds
  over the part-supplier trade graph — the density backbone next to the
  existing BFS/SSSP/CC/PageRank/HITS/triangle family.

Same conventions as every other workload module: identical column aliases
Spark-vs-oracle, exact integer/cents math before any double, deterministic
orderings, broadcast small sides, no unbounded driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeforge.functions.keys import duckdb_md5_int_sql, md5_int

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Privacy: l-diversity release audit (extends orders_kanon_release).
# ---------------------------------------------------------------------------

_LDIV_K, _LDIV_L = 10, 3


def q_orders_ldiversity_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the (market segment, order year) quasi-
    identifier with o_orderpriority as the sensitive attribute: a group
    passes release only if it is k-anonymous (n >= 10) AND l-diverse
    (>= 3 distinct priorities) — k alone cannot stop a homogeneity
    attack (Machanavajjhala et al. 2007: a k-large group with ONE
    sensitive value reveals it for every member).

    Plan: one broadcast dim join + one map-side-combined hash aggregate
    to the QI-group table (|segments| x |years| rows); the distinct-
    sensitive count rides the same aggregate via count(distinct) over a
    5-value domain (Spark expands it to a tiny two-phase agg).  No
    second scan, no window.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rows = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(
        "c_mktsegment",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderpriority",
    )
    grp = rows.groupBy("c_mktsegment", "order_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("n_priorities"),
    )
    return grp.select(
        "c_mktsegment",
        "order_year",
        "n",
        "n_priorities",
        (
            (F.col("n") >= _LDIV_K) & (F.col("n_priorities") >= _LDIV_L)
        ).alias("released"),
    )


SQL_ORDERS_LDIVERSITY = f"""
WITH rows_ AS (
    SELECT c.c_mktsegment,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           o.o_orderpriority
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, order_year,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       (count(*) >= {_LDIV_K}
        AND count(DISTINCT o_orderpriority) >= {_LDIV_L}) AS released
FROM rows_ GROUP BY c_mktsegment, order_year
"""

QUERIES["orders_ldiversity_release"] = q_orders_ldiversity_release
ORACLE_SQL["orders_ldiversity_release"] = SQL_ORDERS_LDIVERSITY


# ---------------------------------------------------------------------------
# Sketch: count-min calibration (estimate vs exact, overcount >= 0).
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 64


def q_cms_heavy_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over (priority, status) order frequencies with
    the estimate audited against the exact count per item.  The counter
    build is the honest streaming shape: each RAW order row contributes
    d = 4 (row, col) increments MAP-SIDE; partial aggregation collapses
    them before the shuffle, so the exchange carries at most d*w = 256
    cells per task regardless of fact size — the mergeability that makes
    CMS the standard distributed frequency sketch.  The estimate is the
    min over the item's d counters; CMS never undercounts, so
    ``overcount = cms_n - exact_n >= 0`` is a hard invariant the oracle
    (and tests) check.
    """
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    # d hash rows per fact row, map-side fan-out, 256-cell shuffle.
    cells = [
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(
                md5_int("o_orderpriority", "o_orderstatus", F.lit(f"cms-r{r}")),
                F.lit(_CMS_W),
            ).alias("col"),
        )
        for r in range(_CMS_D)
    ]
    counters = (
        o.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    items = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    probes = items.select(
        "o_orderpriority",
        "o_orderstatus",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            md5_int(
                                "o_orderpriority",
                                "o_orderstatus",
                                F.lit(f"cms-r{r}"),
                            ),
                            F.lit(_CMS_W),
                        ).alias("col"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select(
        "o_orderpriority", "o_orderstatus", "exact_n",
        F.col("p.r").alias("r"), F.col("p.col").alias("col"),
    )
    est = (
        probes.join(F.broadcast(counters), ["r", "col"])
        .groupBy("o_orderpriority", "o_orderstatus", "exact_n")
        .agg(F.min("cnt").cast("bigint").alias("cms_n"))
    )
    return est.select(
        "o_orderpriority",
        "o_orderstatus",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
    )


def _cms_hash_sql(r: int) -> str:
    return (
        duckdb_md5_int_sql(["o_orderpriority", "o_orderstatus", f"'cms-r{r}'"])
        + f" % {_CMS_W}"
    )


SQL_CMS_HEAVY_STATUS = f"""
WITH o AS (SELECT o_orderpriority, o_orderstatus FROM orders),
incr AS (
    {" UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_hash_sql(r)} AS col FROM o"
        for r in range(_CMS_D)
    )}
),
counters AS (
    SELECT r, col, CAST(count(*) AS BIGINT) AS cnt FROM incr GROUP BY r, col
),
items AS (
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS exact_n
    FROM o GROUP BY o_orderpriority, o_orderstatus
),
probes AS (
    {" UNION ALL ".join(
        f"SELECT o_orderpriority, o_orderstatus, exact_n, {r} AS r, "
        f"{_cms_hash_sql(r)} AS col FROM items"
        for r in range(_CMS_D)
    )}
)
SELECT p.o_orderpriority, p.o_orderstatus, p.exact_n,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_n,
       CAST(MIN(c.cnt) - p.exact_n AS BIGINT) AS overcount
FROM probes p JOIN counters c USING (r, col)
GROUP BY p.o_orderpriority, p.o_orderstatus, p.exact_n
"""

QUERIES["cms_heavy_status"] = q_cms_heavy_status
ORACLE_SQL["cms_heavy_status"] = SQL_CMS_HEAVY_STATUS


# ---------------------------------------------------------------------------
# ML prep: hashing-trick categorical encoder with collision accounting.
# ---------------------------------------------------------------------------

_FH_D = 32


def q_feature_hash_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick encoding of the (segment x nation) cross feature
    into D = 32 signed buckets (Weinberger et al. 2009): bucket =
    md5(feature) % D, sign = +-1 from an independent hash bit.  The
    output audits what a fixed-width hashed feature space costs:
    per-bucket row mass, how many DISTINCT source features collided into
    the bucket, and the signed sum (sign-hashing makes collisions cancel
    in expectation — the reason Vowpal-Wabbit-style learners tolerate
    D << vocabulary).

    Plan: one broadcast dim join, row-local hash arithmetic, one
    map-side-combined aggregate to D rows.  No shuffle wider than the
    bucket table at any corpus size — the encoder never materializes a
    vocabulary, which is exactly its 100 TB selling point.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    feat = F.concat_ws(
        "&",
        F.concat(F.lit("seg="), F.col("c_mktsegment")),
        F.concat(F.lit("nat="), F.col("c_nationkey").cast("string")),
    )
    rows = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment", "c_nationkey")),
        o.o_custkey == c.c_custkey,
    ).select(
        feat.alias("feature"),
        F.pmod(md5_int(feat, F.lit("fh-bucket")), F.lit(_FH_D))
        .cast("int").alias("bucket"),
        (F.pmod(md5_int(feat, F.lit("fh-sign")), F.lit(2)) * 2 - 1)
        .cast("bigint").alias("sign"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("feature").cast("bigint").alias("n_features"),
        F.sum("sign").cast("bigint").alias("signed_n"),
    )


_FH_FEAT = "concat('seg=', c_mktsegment, '&', 'nat=', CAST(c_nationkey AS VARCHAR))"

SQL_FEATURE_HASH_SEGMENTS = f"""
WITH rows_ AS (
    SELECT {_FH_FEAT} AS feature,
           CAST({duckdb_md5_int_sql([_FH_FEAT, "'fh-bucket'"])} % {_FH_D}
                AS INT) AS bucket,
           CAST({duckdb_md5_int_sql([_FH_FEAT, "'fh-sign'"])} % 2 * 2 - 1
                AS BIGINT) AS sign
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT feature) AS BIGINT) AS n_features,
       CAST(SUM(sign) AS BIGINT) AS signed_n
FROM rows_ GROUP BY bucket
"""

QUERIES["feature_hash_segments"] = q_feature_hash_segments
ORACLE_SQL["feature_hash_segments"] = SQL_FEATURE_HASH_SEGMENTS

# ---------------------------------------------------------------------------
# Imputation: LOCF gap-fill over a dense (nation, month) spine.
# ---------------------------------------------------------------------------


def q_nation_spend_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward) imputation of each
    nation's monthly order spend over a DENSE month spine: months where a
    nation had no orders inherit the nation's most recent observed value,
    flagged ``imputed`` (leading months before the first observation stay
    NULL — LOCF has nothing to carry).  The standard series repair before
    lag/rolling feature extraction, done as one window — not a loop.

    Plan: one fact aggregate to (nation, month) cells; the spine is
    |nations| x |observed months| built by a documented broadcast-scalar
    fan-out (nation dim x collected-free month list, both dimension-
    sized); the fill is ONE window per nation ordered by month
    (F.last ignorenulls) — a single narrow shuffle of the cell table,
    never of the fact."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("nationkey", "month")
        .agg(F.sum("cents").cast("bigint").alias("spend_cents"))
    )
    months = o.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).distinct()
    # nations x observed-months spine: both sides dimension-sized; the
    # BNLJ here is the documented broadcast fan-out shape (PLAN_AUDIT).
    spine = (
        n.select(F.col("n_nationkey").cast("int").alias("nationkey"),
                 "n_name")
        .crossJoin(F.broadcast(months))
    )
    joined = spine.join(cells, ["nationkey", "month"], "left")
    w = (
        Window.partitionBy("nationkey")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "nationkey",
        "n_name",
        "month",
        F.last("spend_cents", ignorenulls=True).over(w)
        .cast("bigint").alias("spend_cents_locf"),
        F.col("spend_cents").isNull().alias("imputed"),
    )


SQL_NATION_SPEND_LOCF = """
WITH cells AS (
    SELECT CAST(c.c_nationkey AS INT) AS nationkey,
           CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
months AS (
    SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month
    FROM orders
),
spine AS (
    SELECT CAST(n.n_nationkey AS INT) AS nationkey, n.n_name, m.month
    FROM nation n, months m
)
SELECT s.nationkey, s.n_name, s.month,
       CAST(last_value(c.spend_cents IGNORE NULLS) OVER (
            PARTITION BY s.nationkey ORDER BY s.month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS spend_cents_locf,
       c.spend_cents IS NULL AS imputed
FROM spine s LEFT JOIN cells c USING (nationkey, month)
"""

QUERIES["nation_spend_locf"] = q_nation_spend_locf
ORACLE_SQL["nation_spend_locf"] = SQL_NATION_SPEND_LOCF


# ---------------------------------------------------------------------------
# Interval occupancy: in-transit days per (supplier, month).
# ---------------------------------------------------------------------------

_TRANSIT_MOD = 28


def q_supplier_transit_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x calendar-bucket occupancy rollup: each shipment is
    in transit for [l_shipdate, l_shipdate + 1 + quantity % 28 days]
    (deterministic synthetic duration — the testdata carries no receipt
    date); the query reports, per (supplier, month), how many
    shipment-days fell inside that month plus how many shipments touched
    it.  The resource-occupancy shape (bed-days, machine-hours,
    in-transit inventory) computed WITHOUT a sweep line or global sort:
    explode each interval onto the months it overlaps (fan-out bounded
    by max duration / month length + 1 = 2 here), clip, aggregate.

    Plan: the month explode is row-local (sequence over at most 2
    elements); ONE map-side-combined aggregate to (supplier, month).
    At 100 TB the same plan holds because the fan-out bound comes from
    the DURATION CAP, not data volume — the standard trick is capping
    pathological intervals before the explode."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("ship"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (F.col("l_quantity").cast("int") % _TRANSIT_MOD) + 1,
        ).alias("receipt"),
    )
    exploded = li.select(
        "l_suppkey",
        "ship",
        "receipt",
        F.explode(
            F.sequence(
                F.date_trunc("month", "ship").cast("date"),
                F.date_trunc("month", "receipt").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month"),
    )
    month_end = F.last_day(F.col("month"))
    overlap = (
        F.datediff(F.least(F.col("receipt"), month_end),
                   F.greatest(F.col("ship"), F.col("month"))) + 1
    )
    return (
        exploded.groupBy("l_suppkey", "month")
        .agg(
            F.sum(overlap.cast("bigint")).alias("transit_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_shipments"),
        )
    )


SQL_SUPPLIER_TRANSIT_OCCUPANCY = f"""
WITH iv AS (
    SELECT l_suppkey,
           CAST(l_shipdate AS DATE) AS ship,
           CAST(l_shipdate AS DATE)
               + (CAST(l_quantity AS INT) % {_TRANSIT_MOD} + 1) AS receipt
    FROM lineitem
),
ex AS (
    SELECT l_suppkey, ship, receipt,
           CAST(unnest(generate_series(
               CAST(date_trunc('month', ship) AS DATE),
               CAST(date_trunc('month', receipt) AS DATE),
               INTERVAL 1 MONTH)) AS DATE) AS month
    FROM iv
)
SELECT l_suppkey, month,
       CAST(SUM(date_diff('day',
                GREATEST(ship, month),
                LEAST(receipt, last_day(month))) + 1) AS BIGINT)
           AS transit_days,
       CAST(count(*) AS BIGINT) AS n_shipments
FROM ex GROUP BY l_suppkey, month
"""

QUERIES["supplier_transit_occupancy"] = q_supplier_transit_occupancy
ORACLE_SQL["supplier_transit_occupancy"] = SQL_SUPPLIER_TRANSIT_OCCUPANCY


# ---------------------------------------------------------------------------
# Graph: k-core of the part-supplier trade graph (synchronized peeling).
# ---------------------------------------------------------------------------

_KCORE_K, _KCORE_ROUNDS = 25, 6


def q_trade_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (ops/graph.py::kcore_nodes) of the bipartite
    part<->supplier trade graph (same node encoding as pagerank_trade:
    2*part / 2*supp+1, symmetric edges): peel nodes with degree < 25 in
    synchronized rounds until stable, report survivors with their
    residual in-core degree — the dense trading backbone (parts carried
    by many well-connected suppliers), the graph-density counterpart of
    the HITS/PageRank importance scores already in the registry.

    The DuckDB oracle unrolls the SAME 6 peeling rounds as a CTE chain,
    so the iterative Spark formulation and the relational one
    cross-check each other (bfs_depths contract)."""
    from lakeforge.ops.graph import kcore_nodes

    li = _t(spark, sf_dir, "lineitem")
    e0 = li.select("l_partkey", "l_suppkey").distinct()
    edges = e0.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).unionAll(
        e0.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"),
            (F.col("l_partkey") * 2).alias("dst"),
        )
    )
    core = kcore_nodes(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return core.select(
        F.when(F.col("node") % 2 == 0, "part").otherwise("supplier")
        .alias("kind"),
        F.expr("node div 2").cast("bigint").alias("key"),
        "core_deg",
    )


def _sql_kcore(k: int, rounds: int) -> str:
    # MATERIALIZED is load-bearing: k{r} is referenced twice per round and
    # each g{r} chains on g{r-1}, so DuckDB's default CTE inlining would
    # re-evaluate the whole prefix ~3^rounds times (measured 40s at
    # sf0.001 vs <1s materialized).
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT l_partkey, l_suppkey"
        " FROM lineitem)",
        "g0 AS MATERIALIZED (SELECT 2*l_partkey AS a, 2*l_suppkey+1 AS b"
        " FROM e0 UNION ALL SELECT 2*l_suppkey+1, 2*l_partkey FROM e0)",
    ]
    prev = "g0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT a, count(*) AS deg FROM {prev}"
            f" GROUP BY a)"
        )
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT a FROM d{r} WHERE deg >= {k})"
        )
        ctes.append(
            f"g{r} AS MATERIALIZED (SELECT g.a, g.b FROM {prev} g"
            f" JOIN k{r} x ON g.a = x.a JOIN k{r} y ON g.b = y.a)"
        )
        prev = f"g{r}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN a % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       CAST(a // 2 AS BIGINT) AS key,
       CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY 1, 2 HAVING count(*) >= {k}
"""
    )


QUERIES["trade_kcore"] = q_trade_kcore
ORACLE_SQL["trade_kcore"] = _sql_kcore(_KCORE_K, _KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Training-data dedup primitive: cross-document repeated spans
# (ExactSubstr, Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better").
# ---------------------------------------------------------------------------

_SPAN_N = 5  # token n-gram granularity of the repeated-substring probe

_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


def q_docs_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document maximal repeated spans: positional 5-gram shingles
    whose gram occurs in >= 2 DISTINCT documents, merged into maximal
    spans via gaps-and-islands (grams at positions i and j belong to one
    span when j - i <= n, i.e. their token windows overlap or touch).
    Reports per doc the span count, repeated token mass, and longest
    span — the signal ExactSubstr-style training-data dedup cuts on
    (shared boilerplate, licensing blocks, copied passages).

    Plan: grams shuffle as 60-bit HASHES, never text (the same
    text-never-shuffles rule as the MinHash path); the df >= 2 filter is
    a map-side-combined aggregate on gram_h; the island merge is one
    window per doc over the (small) matched-position set.  Cost is
    O(tokens) end-to-end — no pairwise doc comparison exists in the
    plan, which is what lets ExactSubstr run corpus-wide at 100 TB."""
    n = _SPAN_N
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.array_remove(F.split(F.lower(F.col("text")), r"\s+"), "").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN "
                f"transform(sequence(1, size(toks) - {n} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {n}))) "
                f"ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), md5_int("gram").alias("gram_h"))
    rep = (
        grams.groupBy("gram_h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram_h")
    )
    hits = grams.join(rep, "gram_h", "left_semi").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    brk = F.when(F.col("i") - F.lag("i").over(w) <= n, F.lit(0)).otherwise(F.lit(1))
    spans = (
        hits.withColumn("brk", brk)
        .withColumn(
            "span_id",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "span_id")
        .agg(F.min("i").alias("s"), F.max("i").alias("e"))
    )
    span_len = F.col("e") - F.col("s") + n
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(span_len).cast("bigint").alias("repeated_tokens"),
        F.max(span_len).cast("bigint").alias("max_span_tokens"),
    )


SQL_DOCS_REPEATED_SPANS = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
pos AS (SELECT doc_id,
               unnest(range(1, greatest(len(toks) - {_SPAN_N} + 2, 1))) AS i,
               toks
        FROM toks),
grams AS (SELECT doc_id, i,
                 {duckdb_md5_int_sql([f"array_to_string(toks[i:i+{_SPAN_N - 1}], ' ')"])}
                     AS gram_h
          FROM pos),
rep AS (SELECT gram_h FROM grams GROUP BY gram_h
        HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.i FROM grams g
         WHERE g.gram_h IN (SELECT gram_h FROM rep)),
brk AS (SELECT doc_id, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                         <= {_SPAN_N} THEN 0 ELSE 1 END AS brk
        FROM hits),
isl AS (SELECT doc_id, i,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS span_id
        FROM brk),
spans AS (SELECT doc_id, span_id, MIN(i) AS s, MAX(i) AS e
          FROM isl GROUP BY doc_id, span_id)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s + {_SPAN_N}) AS BIGINT) AS repeated_tokens,
       CAST(MAX(e - s + {_SPAN_N}) AS BIGINT) AS max_span_tokens
FROM spans GROUP BY doc_id
"""

QUERIES["docs_repeated_spans"] = q_docs_repeated_spans
ORACLE_SQL["docs_repeated_spans"] = SQL_DOCS_REPEATED_SPANS
