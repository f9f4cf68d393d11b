"""Corpus-management operators for web-scale training-data pipelines.

* ``deterministic_sample`` — content-keyed Bernoulli sampling: a row is in
  the sample iff a stable hash of its key falls under the rate. Unlike
  ``df.sample`` the decision is a pure function of the key — stable across
  partitioning, retries, cluster sizes, and re-runs, and the SAME rows are
  selected when the job is resumed or the table is re-read. sha256-based so
  the DuckDB oracle reproduces it exactly.
* ``stratified_sample`` — per-stratum rates (e.g. downsample boilerplate
  domains, keep rare languages), same stability guarantees.
* ``corpus_stats`` — per-group size/token/length profile with exact
  discrete percentiles; the first thing you compute on a new 100 TB crawl.

All pure column arithmetic — no shuffle for the samplers, one partial-agg
shuffle for the stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hash_unit(key: Column, *, buckets: int = 1_000_000) -> Column:
    """Stable uniform int in [0, buckets) from sha256 of the key string —
    reproducible in any engine with sha256 (the first 8 hex chars = 32 bits,
    uniform, far above any realistic rate resolution)."""
    return F.conv(F.substring(F.sha2(key.cast("string"), 256), 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame,
    key: str,
    rate: float,
    *,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Keep rows whose hash bucket < rate * buckets. Filter-only: pushes to
    the scan, no shuffle, no RNG state."""
    threshold = int(rate * buckets)
    return df.filter(_hash_unit(F.col(key), buckets=buckets) < threshold)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value ->
    keep rate; unlisted strata keep ``default_rate``. The hash is keyed on
    (stratum, key) so changing one stratum's rate never perturbs another's
    selection."""
    threshold = F.lit(int(default_rate * buckets))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(stratum_col) == value, int(rate * buckets)).otherwise(threshold)
    h = _hash_unit(F.concat_ws("|", F.col(stratum_col), F.col(key).cast("string")), buckets=buckets)
    return df.filter(h < threshold)


def corpus_stats(
    df: DataFrame,
    group_col: str,
    *,
    text_col: str = "text",
    length_col: str | None = None,
) -> DataFrame:
    """Per-group corpus profile: docs, total/mean length, exact discrete
    median and p90 length. percentile_disc is deterministic (no
    interpolation), so the result is oracle-checkable."""
    length = F.col(length_col) if length_col else F.length(F.col(text_col))
    src = df.select(F.col(group_col).alias("group_key"), length.alias("__len"))
    return src.groupBy("group_key").agg(
        F.count("*").alias("n_docs"),
        F.sum("__len").alias("total_chars"),
        F.round(F.avg("__len"), 4).alias("mean_chars"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY __len) AS BIGINT)").alias("p50_chars"),
        F.expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY __len) AS BIGINT)").alias("p90_chars"),
    )


def mix_to_weights(
    df: DataFrame,
    weights_ppm: dict[str, int],
    *,
    stratum_col: str = "source",
    key: str = "doc_id",
    mass_col: str = "n_tokens",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Downsample strata to a target mixture (parts-per-million weights):
    the largest corpus achievable at EXACTLY those proportions without
    upsampling any source — the data-mixing step of a pre-training run.

    Budget rule: with T_s = current mass of stratum s and w_s its target
    ppm, the binding stratum sets the total budget B = min_s (T_s * 1e6
    DIV w_s); stratum s then keeps mass M_s = B * w_s DIV 1e6 via the
    deterministic (stratum, key)-hashed filter at threshold M_s * buckets
    DIV T_s. All arithmetic is BIGINT integer division, so any engine
    reproduces the selection bit-exactly — no float-boundary knife edges.
    Strata absent from ``weights_ppm`` (or weighted 0) are dropped.

    Scale shape: one partial-agg shuffle for the per-stratum masses (a
    #strata-sized frame), thresholds derived declaratively and
    broadcast-joined back; the corpus itself never shuffles — the filter
    runs at scan speed like the other samplers in this module.
    """
    w_expr = F.lit(0)
    for value, ppm in sorted(weights_ppm.items()):
        w_expr = F.when(F.col(stratum_col) == value, F.lit(int(ppm))).otherwise(w_expr)
    masses = (
        df.groupBy(stratum_col)
        .agg(F.sum(F.col(mass_col)).cast("long").alias("__mass"))
        .withColumn("__w", w_expr.cast("long"))
        .filter(F.col("__w") > 0)
    )
    budget = masses.select(
        F.min(F.expr("__mass * 1000000 DIV __w")).cast("long").alias("__B")
    )
    thresholds = (
        masses.crossJoin(F.broadcast(budget))
        .select(
            stratum_col,
            F.expr(f"((__B * __w DIV 1000000) * CAST({int(buckets)} AS BIGINT)) DIV __mass").alias(
                "__thr"
            ),
        )
    )
    h = _hash_unit(
        F.concat_ws("|", F.col(stratum_col), F.col(key).cast("string")), buckets=buckets
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .filter(h < F.col("__thr"))
        .drop("__thr")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
) -> DataFrame:
    """Cap the corpus at ``n`` rows per group (host/domain/source) keeping
    the ``n`` smallest by ``order_col`` — the standard crawl-corpus guard
    against a handful of giant hosts dominating the training mix.

    Skew-aware two-phase shape: one partial-agg count finds the groups OVER
    the cap (in a web crawl that is a tiny, zipf-head set — broadcast), rows
    of every under-cap group pass through with NO per-row shuffle, and only
    the over-cap groups' rows enter the row_number window. The expensive
    ordered repartition therefore touches the head of the distribution, not
    the 10^12-row tail. Deterministic: the kept set is a pure function of
    (group, order_col), stable across partitioning and re-runs; pass a
    content hash as ``order_col`` for an unbiased cap or a quality score for
    a best-first cap.
    """
    from pyspark.sql import Window

    heavy = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > n)
        .select(group_col)
    )
    light_rows = df.join(F.broadcast(heavy), group_col, "left_anti")
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    heavy_rows = (
        df.join(F.broadcast(heavy), group_col, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return light_rows.unionByName(heavy_rows)
