package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical operators with engine-exact arithmetic.
  *
  * The trick shared with [[Embeddings.dimStats]]: values quantize to
  * integers first, so distributed sums are order-independent, and every
  * subsequent double op (division, multiplication, sqrt — all IEEE
  * correctly-rounded) is bit-identical in any engine. No raw-double
  * summation ever crosses a shuffle.
  */
object Stats {

  /** CUSUM drift detection per group — the sequential change-point
    * monitor (Page's cumulative sum): S_i = max(0, S_{i−1} + (x_i − k))
    * with an alarm whenever S_i > h, computed WITHOUT the recursion via
    * the prefix identity S_i = C_i − min(0, min_{j≤i} C_j) where C is
    * the running sum of (x − k) — two ordered window passes per group.
    * The reference k is the group mean plus `allowance` (choose ≈ σ/2
    * to target a drift size, per the standard tuning); `h` is the alarm
    * threshold (≈ 4-5σ). Pass `reference` to pin k to a PRE-TRAINED
    * level instead of the in-sample group mean — the production
    * posture (a long contamination window raises the self-computed
    * mean by half the shift and cancels the very drift it should
    * detect), and the form the streaming
    * [[graft.streaming.DriftMonitor]] maintains incrementally.
    *
    * All arithmetic is fixed-point (quantized at `scale`), so the
    * running sums are EXACT under any window-aggregation strategy — a
    * raw-double cumsum would hash-differ between Spark's sequential
    * accumulation and an engine that evaluates window sums through a
    * segment tree (DuckDB does), because the summation TREE differs
    * even though the ordered frame is identical. The prefix sums
    * accumulate in DECIMAL(38,0), not int64: |C_n| can reach
    * n·scale·|x−k|, which wraps a signed 64-bit value around 9·10⁷
    * rows/group at scale 10⁶ and |x|~10⁵ — below the very
    * rows-per-group posture this operator shards at. DuckDB widens
    * SUM(BIGINT) to HUGEINT implicitly, so an int64 Spark sum would
    * not only wrap, it would silently DIVERGE from the oracle;
    * decimal(38,0) matches the int128 behavior to 10³⁸.
    *
    * Scale: one shuffle on the group key, in-partition sort per window
    * (the rolling-aggregate shape); each group's scan is inherently
    * sequential — the parallelism is the group count, exactly how a
    * per-metric monitor shards at 100 TB. Output per group: n_points,
    * n_alarms, max_s (back in value units).
    */
  def cusumDrift(
      df: DataFrame, groupCol: String, valueCol: String,
      orderCols: Seq[String], allowance: Double, h: Double,
      scale: Long = 1000000L,
      reference: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = floor(col(valueCol).cast("double") * scale.toDouble + 0.5).cast("long")
    val rows = df.select((col(groupCol) +: orderCols.map(col)) :+ q.as("q"): _*)
    val allowQ = math.floor(allowance * scale + 0.5).toLong
    val hQ = math.floor(h * scale + 0.5).toLong
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMean = reference match {
      case Some(r) => rows.withColumn("mean_q",
        lit(math.floor(r * scale + 0.5).toLong))
      case None =>
        val means = rows.groupBy(col(groupCol)).agg(
          floor(sum(col("q").cast("decimal(38,0)")).cast("double")
            / count(lit(1)) + 0.5).cast("long").as("mean_q"))
        rows.join(broadcast(means), Seq(groupCol))
    }
    withMean
      .withColumn("dev",
        (col("q") - col("mean_q") - lit(allowQ)).cast("decimal(38,0)"))
      .withColumn("c", sum(col("dev")).over(w))
      .withColumn("s",
        col("c") - least(lit(0L).cast("decimal(38,0)"), min(col("c")).over(w)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_points"),
        count(when(col("s") > hQ, 1)).as("n_alarms"),
        (max(col("s")).cast("double") / scale.toDouble).as("max_s"))
  }

  /** Per-group z-score outlier detection: count of |z| > `zThresh`
    * rows and the rounded max |z| per group. `scale` is the fixed-point
    * quantization (10³ for values up to ~10⁵ at 10⁸ rows/group before
    * the q² sum nears 2^63 — raise/lower to trade range vs precision).
    *
    * sd = 0 groups (constant value) report zero outliers.
    */
  /** Deterministic corpus-mixture sampling: keep a row when its
    * hash-percent falls under the per-group rate — the data-mixing step
    * that reweights sources in a training corpus, reproducible across
    * engines and re-runs (no rand()). `rates` maps group value →
    * keep-percent [0,100]; unlisted groups use `defaultRate`.
    * Narrow map-side filter; no shuffle.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val pct = pmod(Dedup.hash32(concat_ws("|", lit("mix"), col(idCol).cast("string"))),
      lit(100L))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(pct < rate)
  }

  /** Temperature-based mixture reweighting (α = 0.5): the data-mixing
    * step an LLM training run uses to flatten source skew — weight_s ∝
    * √n_s, so a 100× bigger source gets only 10× the weight. α = 0.5
    * keeps the op engine-exact: sqrt is IEEE correctly-rounded
    * (arbitrary pow is not), and each √n quantizes to 10⁻⁶ fixed point
    * BEFORE the cross-source sum so the normalizer is an
    * order-independent integer (the bm1 trick). One count shuffle +
    * a broadcast scalar; weights feed [[mixtureSample]]-style rates.
    */
  def temperatureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("q",
        floor(sqrt(col("n_docs").cast("double")) * 1000000.0 + 0.5).cast("long"))
    val tot = counts.agg(sum(col("q")).as("qtot"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"),
        TextAnalysis.round6(col("q").cast("double") / col("qtot")).as("weight6"))
  }

  /** MATERIALIZE the α = 0.5 temperature mixture by deterministic
    * hash-Bernoulli downsampling: source s keeps documents at rate
    * √(n_min/n_s) — the largest rate (the smallest source's) is exactly
    * 1, because Bernoulli can only downsample — so the sampled corpus
    * holds E[n'_s] = √(n_s · n_min) ∝ √n_s documents per source:
    * [[temperatureWeights]]' mixture realized as actual rows, the step
    * between computing a data recipe and shipping one. The rate is one
    * IEEE division + correctly-rounded sqrt quantized to millionths
    * (engine-exact), and keep/drop is decided by the md5-prefix doc
    * hash ([[graft.ops.Dedup.hash32]]) — re-runs and engines agree
    * ROW-FOR-ROW, not just in expectation (sm1's argument). Plan: one
    * count shuffle, a broadcast scalar, a broadcast |sources|-row rate
    * join, one narrow filter — flat at any corpus size.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val nMin = counts.agg(min(col("n_docs")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol),
        floor(sqrt(col("n_min").cast("double") / col("n_docs").cast("double"))
          * 1000000.0 + 0.5).cast("long").as("rate6"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(Dedup.hash32(
          concat_ws("|", lit("mix3"), col(idCol).cast("string"))),
        lit(1000000L)) < col("rate6"))
      .drop("rate6")
  }

  def zOutliers(df: DataFrame, groupCol: String, valueCol: String,
      zThresh: Double, scale: Long = 1000L): DataFrame = {
    val q = floor(col(valueCol).cast("double") * scale.toDouble + 0.5).cast("long")
    val rows = df.select(col(groupCol), q.as("q"))
    val stats = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"),
        sum(col("q") * col("q")).as("qsq"))
      .select(col(groupCol), col("n"),
        (col("qsum").cast("double") / col("n") / scale.toDouble).as("mean"),
        sqrt((col("qsq").cast("double") / col("n")
          - (col("qsum").cast("double") / col("n")) * (col("qsum").cast("double") / col("n")))
          / (scale.toDouble * scale)).as("sd"))
    val z = when(col("sd") === 0.0, lit(0.0))
      .otherwise((col("q").cast("double") / scale.toDouble - col("mean")) / col("sd"))
    // no broadcast hint: at low group cardinality AQE broadcasts the
    // stats side on its own; at high cardinality (group = user id) a
    // forced broadcast would build a driver-sized hash table — the
    // equi-join must be allowed to fall back to shuffle
    rows.join(stats, Seq(groupCol))
      .select(col(groupCol), col("n"), abs(z).as("absz"))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"),
        sum(when(col("absz") > zThresh, 1L).otherwise(0L)).as("n_outliers"),
        TextAnalysis.round6(max(col("absz"))).as("max_absz6"))
  }

  /** Per-group ordinary-least-squares trend: slope (in value units per
    * day), Pearson correlation, and n for `valueCol` against time — the
    * "is this metric drifting, and how fast" primitive a monitoring
    * rollup runs per segment.
    *
    * Determinism strategy (the engine-reproducibility contract): x is
    * whole DAYS since a fixed origin (integer-exact in any engine) and
    * y is `scale`-fixed-point (floor(v·scale + 0.5) — half-up, same on
    * both sides), so all six sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) are EXACT integer sums — one partial-aggregated shuffle,
    * summation order irrelevant. The closed-form combines run in IEEE
    * doubles over those exactly-agreed operands in a fixed expression
    * order, so slope/corr are bit-identical across engines without any
    * rounding step. Long-overflow headroom: Σy² ≤ n·(scale·max|v|)²
    * needs n·(scale·max)² < 2⁶³ — at scale 1000 and |v| ≤ 10⁶ that
    * allows n ≈ 10⁴ rows per group per 10¹⁸... i.e. fine through sf10;
    * drop `scale` one decade per two decades of further growth.
    */
  def groupRegression(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, scale: Long = 1000L): DataFrame = {
    val x = datediff(to_date(col(tsCol)), lit("1995-01-01").cast("date")).cast("long")
    val y = floor(col(valueCol).cast("double") * scale.toDouble + 0.5).cast("long")
    val s = df.select(col(groupCol), x.as("x"), y.as("y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val cov = nD * col("sxy").cast("double") - sxD * syD
    val varx = nD * col("sxx").cast("double") - sxD * sxD
    val vary = nD * col("syy").cast("double") - syD * syD
    s.select(col(groupCol), col("n"),
      when(varx === 0.0, lit(0.0))
        .otherwise(cov / varx / scale.toDouble).as("slope_per_day"),
      when(varx === 0.0 || vary === 0.0, lit(0.0))
        .otherwise(cov / sqrt(varx * vary)).as("corr"))
  }

  /** Deterministic WEIGHTED Bernoulli sampling: row i survives with
    * probability min(1, weight·scale/10⁶), decided by its id hash —
    * the importance-sampling step that up-weights long/rare documents
    * in a corpus mix, reproducible across engines and re-runs (the
    * same no-rand() contract as [[mixtureSample]], but per-row
    * probabilities instead of per-group rates). Narrow map-side
    * filter; no shuffle, no state.
    *
    * The weight multiplies BEFORE truncating to fixed point, so
    * fractional weights keep their probability (weight 0.5 → keep-prob
    * 0.5·scale/10⁶, not 0). NULL-weight rows are dropped — an unknown
    * importance must not default to always-kept (Spark's least() skips
    * nulls, which would otherwise silently do exactly that).
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      scale: Long): DataFrame = {
    val u = pmod(Dedup.hash32(concat_ws("|", lit("wsamp"), col(idCol).cast("string"))),
      lit(1000000L))
    df.filter(col(weightCol).isNotNull &&
      u < least((col(weightCol).cast("double") * scale.toDouble).cast("long"),
        lit(1000000L)))
  }

  /** Per-group robust (median/MAD) outlier detection — the
    * heavy-tail-safe sibling of [[zOutliers]]: mean/sd are themselves
    * dragged by the outliers they're meant to find, medians are not.
    * Flags |x − median| > `cut`·MAD (no 1.4826 Gaussian consistency
    * factor — `cut` is specified directly in MAD units, which keeps the
    * threshold arithmetic rational).
    *
    * Determinism: values quantize to `scale` fixed point FIRST, so both
    * medians interpolate integer-valued doubles (p=0.5 ⇒ the
    * interpolation fraction is exactly 0 or 0.5 — exact in IEEE double
    * under any of the standard interpolation formulas, hence
    * engine-identical without rounding). Three group-partitioned
    * shuffles (median, deviation median, verdict), no broadcast hint —
    * AQE picks the join strategy so high-cardinality groups fall back
    * to shuffle join (the [[zOutliers]] lesson).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cut: Double = 3.0, scale: Long = 1000L): DataFrame = {
    val q = floor(col(valueCol).cast("double") * scale.toDouble + 0.5).cast("long")
    val rows = df.select(col(groupCol), q.as("q"))
    val med = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), expr("percentile(q, 0.5D)").as("med"))
    val dev = rows.join(med, Seq(groupCol))
      .select(col(groupCol), col("q"), abs(col("q") - col("med")).as("adev"))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(when(col("adev") > lit(cut) * col("mad"), 1L).otherwise(0L))
        .as("n_outliers"))
      .join(med, Seq(groupCol)).join(mad, Seq(groupCol))
      .select(col(groupCol), col("n"),
        (col("med") / scale.toDouble).as("med"),
        (col("mad") / scale.toDouble).as("mad"),
        col("n_outliers"))
  }

  /** Pearson χ² test of independence between two categorical columns —
    * the "is this feature informative / is this split biased" screen a
    * curation run applies before trusting a stratification. ONE
    * data-sized groupBy builds the contingency cells; every other step
    * runs on the tiny cell table (row/column marginals by re-grouping,
    * n and the degrees of freedom by one more aggregate). Engine-exact
    * despite being a float statistic: each cell's term
    * (O·n − rt·ct)² / (n·rt·ct) divides exact int64 products in one
    * IEEE step and quantizes to millionths BEFORE the sum, so
    * summation order cannot move the result. Returns one row
    * (n_rows, dof, chi2) — compare against the χ² critical value for
    * dof outside the engine.
    */
  def chiSquareIndependence(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // null categories are EXCLUDED up front: a null key never rejoins
    // the marginal cross (null-unsafe equality) and count_distinct
    // drops it from dof, so keeping null rows would silently corrupt
    // both — exclusion is the one behavior that is correct AND visible
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // feeds marginals + totals + terms
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("a")).as("ra"), count_distinct(col("b")).as("cb"))
    // COMPLETE the table: zero-observation cells are absent from the
    // groupBy but still contribute (O=0 ⇒ term = E) — the r×c cross of
    // the tiny marginal tables restores them
    rt.crossJoin(broadcast(ct))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      // products run in DOUBLE: n·rt·ct overflows int64 from ~5M rows
      // (ANSI mode would throw; legacy mode would wrap to garbage).
      // IEEE multiplication is correctly rounded and identical in any
      // engine, so the oracle still hash-matches — the doc's exactness
      // claim holds verbatim while every product stays < 2^53
      .select(col("n"), ((col("ra") - 1) * (col("cb") - 1)).as("dof"),
        floor((col("o").cast("double") * col("n").cast("double")
            - col("rt").cast("double") * col("ct").cast("double"))
          * (col("o").cast("double") * col("n").cast("double")
            - col("rt").cast("double") * col("ct").cast("double"))
          / (col("n").cast("double") * col("rt").cast("double")
            * col("ct").cast("double"))
          * 1000000.0 + 0.5).cast("long").as("qterm"))
      .groupBy(col("n"), col("dof"))
      .agg((sum(col("qterm")).cast("double") / 1000000.0).as("chi2"))
      .select(col("n").as("n_rows"), col("dof"), col("chi2"))
  }
}
