package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: per-column quality stats and equal-width
  * histograms — the inspection pass a pipeline runs before trusting a
  * new corpus drop.
  *
  * Scale notes: `profile` computes every column's aggregates in ONE
  * scan (a single agg node; the multiple DISTINCT aggregates plan as
  * one Expand — rows × profiled columns — with partial aggregation,
  * which beats one full scan per column by #columns). `histogram` is
  * two scans (min/max, then a map-side binning + one small groupBy);
  * bin math is plain IEEE double arithmetic, identical in any engine.
  */
object Profile {

  /** Per-column profile: (col_name, n_rows, n_nulls, n_distinct),
    * one row per profiled column, computed in a single scan.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      count_distinct(col(c)).as(s"__distinct_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("col_name"),
      col("__rows").as("n_rows"), col(s"__nulls_$c").as("n_nulls"),
      col(s"__distinct_$c").as("n_distinct")))
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** The 100 TB profiling path: same shape as [[profile]] but with
    * `approx_count_distinct` (HLL++, `rsd` relative error) — the
    * shuffle carries constant-size sketches per column instead of
    * every distinct value. Use [[profile]] when the oracle needs exact
    * numbers; use this on corpora where a per-column distinct shuffle
    * is itself the bottleneck.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      approx_count_distinct(col(c), rsd).as(s"__distinct_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("col_name"),
      col("__rows").as("n_rows"), col(s"__nulls_$c").as("n_nulls"),
      col(s"__distinct_$c").as("n_distinct_approx")))
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Equal-width histogram: `bins` buckets spanning [min, max], the
    * top edge closed (v == max lands in the last bin). Constant-width
    * degenerate input (min == max) puts everything in bin 0. Output:
    * (bin, n) for non-empty bins.
    *
    * NULL values are excluded (min/max skip them already; without the
    * explicit filter a null v would silently land in the top bin,
    * because `least(null, bins-1)` skips the null). Callers needing a
    * null count should run [[profile]] alongside.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val mm = df.agg(min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"))
    df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(
          floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / bins)),
          lit((bins - 1).toLong)).cast("long"))
        .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }
}
