"""ANALYZE-style per-column table statistics.

The stats a cost-based optimizer (and a pipeline operator choosing
broadcast-vs-shuffle, salt counts, bucket counts) needs: row count,
null count, distinct count, numeric min/max, string min/max — computed
in ONE aggregation pass over the table and unpivoted to one row per
column (the ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``
surface, re-expressed as a plain query so it works on any DataFrame).

``exact=False`` swaps exact ``count_distinct`` (which plans an Expand —
one duplicated pass per distinct column) for HLL ``approx_count_distinct``
— a single streaming pass, the only sane NDV at 100 TB. The exact
variant exists for the differential oracle and for small dims.

String min/max compare in binary UTF-8 order on both Spark and DuckDB
(neither applies a locale collation by default), which is what makes the
string extrema oracle-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def _qcol(name: str):
    """Column reference by exact name — backtick-quoted so names containing
    dots, spaces, quotes, or commas resolve as a single identifier instead
    of being parsed as an expression."""
    return F.col("`" + name.replace("`", "``") + "`")


def table_stats(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per column: (column, n, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str). Numeric extrema are NULL for string
    columns and vice versa; ``n`` is the table row count (repeated per
    row so each stat row is self-contained).

    Internal agg slots are keyed by column POSITION (``__nulls_0`` …) and
    the unpivot is a struct-array explode built with Column objects — no
    raw name is ever interpolated into a SQL string, so arbitrary column
    names (quotes, commas, spaces, reserved words) are safe.
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    ndv = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        is_num = isinstance(schema[c], NumericType)
        src = _qcol(c)
        aggs += [
            F.count(F.when(src.isNull(), 1)).alias(f"__nulls_{i}"),
            ndv(src).alias(f"__ndv_{i}"),
            (F.min(src).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__minn_{i}"
            ),
            (F.max(src).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__maxn_{i}"
            ),
            (F.lit(None).cast("string") if is_num else F.min(src).cast("string")).alias(
                f"__mins_{i}"
            ),
            (F.lit(None).cast("string") if is_num else F.max(src).cast("string")).alias(
                f"__maxs_{i}"
            ),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__nulls_{i}").alias("n_nulls"),
            F.col(f"__ndv_{i}").alias("n_distinct"),
            F.col(f"__minn_{i}").alias("min_num"),
            F.col(f"__maxn_{i}").alias("max_num"),
            F.col(f"__mins_{i}").alias("min_str"),
            F.col(f"__maxs_{i}").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(
        F.col("__n").alias("n"), F.explode(F.array(*rows)).alias("s")
    ).select(
        "s.col_name", "n", "s.n_nulls", "s.n_distinct",
        "s.min_num", "s.max_num", "s.min_str", "s.max_str",
    )


def estimate_join_rows(
    stats_a: DataFrame, col_a: str, stats_b: DataFrame, col_b: str
) -> float:
    """Textbook CBO equi-join cardinality estimate from two `table_stats`
    outputs: |A ⋈ B| ≈ n_a · n_b / max(ndv_a, ndv_b) (uniformity +
    containment assumptions, System R). NULL keys never match, so each
    side's row count is reduced by its null count first. The two stats
    rows are O(1) driver lookups — the estimate is for planning (salt
    counts, broadcast decisions), not a data-sized job."""
    ra = stats_a.filter(F.col("col_name") == col_a).first()
    rb = stats_b.filter(F.col("col_name") == col_b).first()
    if ra is None or rb is None:
        raise ValueError("column not present in stats")
    na = ra["n"] - ra["n_nulls"]
    nb = rb["n"] - rb["n_nulls"]
    ndv = max(ra["n_distinct"], rb["n_distinct"])
    return float(na) * float(nb) / float(max(ndv, 1))


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Population Stability Index between a reference and a current sample
    of ``value_col`` — THE model/feature-monitoring drift metric
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted). Equi-width
    bins over [lo, hi) with clamped edges, Laplace add-one smoothing so
    no bin is empty, and each ``(p−q)·ln(p/q)`` term quantised to a
    1e-6 fixed-point long BEFORE summation (REPRO.md patterns 1/7 — the
    char_entropy discipline), so the PSI is an order-free exact integer
    sum despite ln() being engine-faithful only.

    Plan: two keyed bin-count aggregates (map-side combinable) full-outer
    merged on the bin id; the bounded bin relation (n_bins rows) does all
    float work. Output: one row per bin (bin, n_ref, n_cur, psi_term)
    plus the readers sum psi_term; use ``.agg(sum)`` for the scalar.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    width = (hi - lo) / n_bins

    def bins(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(out)
        )

    a = bins(ref, "n_ref")
    c = bins(cur, "n_cur")
    grid = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    merged = (
        grid.join(a, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    ta = F.sum("n_ref").over(Window.partitionBy()) + n_bins
    tc = F.sum("n_cur").over(Window.partitionBy()) + n_bins
    p = (F.col("n_ref") + 1).cast("double") / ta.cast("double")
    q = (F.col("n_cur") + 1).cast("double") / tc.cast("double")
    term_q = F.round((p - q) * F.log(p / q) * F.lit(1_000_000.0)).cast("long")
    return merged.select(
        "bin",
        "n_ref",
        "n_cur",
        (term_q.cast("double") / F.lit(1_000_000.0)).alias("psi_term"),
    )
