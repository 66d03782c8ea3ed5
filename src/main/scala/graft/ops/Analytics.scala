package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators: N-step funnels and retention
  * cohorts, generalized from the fixed 2-step/weekly query shapes.
  *
  * Scale: both are one shuffle on the user key with partial
  * aggregation, followed by rollups over tiny results. The funnel's
  * per-user event array holds only step-type events (collect_list of a
  * conditional), so its size is bounded by the user's activity in the
  * funnel's own event types, not total activity.
  */
object Analytics {

  /** Per-user strict-order funnel progress: for `steps = [s1, s2, …]`,
    * `reached = k` means the user produced s1, then s2 strictly later,
    * … up to s_k (the greedy earliest-completion walk, equivalent to
    * the chained `min ts > previous step's ts` formulation an oracle
    * states in SQL). Users present in `df` with no step events are kept
    * with reached = 0, so corpus-level denominators stay correct.
    *
    * Output: (user, reached).
    */
  def funnelReached(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perUser = df.groupBy(col(userCol).as("user"))
      .agg(sort_array(collect_list(when(col(typeCol).isin(steps: _*),
        struct(col(tsCol).as("ts"), col(typeCol).as("etype"))))).as("evs"))
    // left fold over the ts-ordered events: state = (step reached so
    // far, ts of the event that reached it); an event advances the
    // state iff it is the next step's type and strictly later than the
    // previous step. Runs once per user over a small array — not a
    // per-pair hot loop, so the interpreted HOF is the right tool.
    val init = struct(lit(0).as("step"), lit(null).cast("timestamp").as("last"))
    val folded = aggregate(col("evs"), init, (st, ev) => {
      val step = st.getField("step")
      val last = st.getField("last")
      val nextType = steps.zipWithIndex.foldLeft(lit(false)) { case (acc, (s, i)) =>
        when(step === i, ev.getField("etype") === s).otherwise(acc)
      }
      val advances = nextType && (step === 0 || ev.getField("ts") > last)
      when(advances,
        struct((step + 1).as("step"), ev.getField("ts").as("last")))
        .otherwise(st)
    })
    perUser.select(col("user"), folded.getField("step").as("reached"))
  }

  /** Corpus-level funnel summary: one row with the user count and the
    * number of users reaching each step.
    */
  def funnelSummary(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val reached = funnelReached(df, userCol, typeCol, tsCol, steps)
    val aggs = count(lit(1)).as("n_users") +:
      steps.indices.map(i =>
        sum(when(col("reached") >= i + 1, 1L).otherwise(0L)).as(s"n_step${i + 1}"))
    reached.agg(aggs.head, aggs.tail: _*)
  }

  /** Top-k length-`3` event paths: per-user time-ordered event triples
    * (sliding, via two LEADs over the user-partitioned sequence window
    * — partitions bounded by per-user event counts) rolled up globally.
    * The "what do users actually do" sequence-mining primitive behind
    * navigation analysis; the per-user window plus one path shuffle is
    * the shape that scales — no self-joins, no per-user collect.
    * Tie-break on (ts, idCol) makes the sequence — and so the result —
    * engine-deterministic even with equal timestamps.
    */
  def topEventPaths(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__s2", lead(col(typeCol), 1).over(w))
      .withColumn("__s3", lead(col(typeCol), 2).over(w))
      .filter(col("__s3").isNotNull)
      .groupBy(concat_ws(">", col(typeCol), col("__s2"), col("__s3")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next = to | current = from), the behavioral model
    * behind "what usually follows a click". One DATA-sized stage — the
    * per-user lead window (partitioned by user, the same shape as
    * [[topEventPaths]]) feeding a groupBy onto the |types|² transition
    * table; row-normalization then runs entirely on that constant-size
    * table (a self-join on the tiny `from` totals, never a window over
    * data). Probabilities are engine-exact: each p6 is ONE fixed
    * round-to-millionths of an int64/int64 ratio.
    */
  def markovTransitions(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val trans = df.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    trans.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        TextAnalysis.round6(col("n").cast("double") / col("row_n")).as("p6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Touch attribution — assign each CONVERSION event (type ==
    * `convType`) to the touch event (type ∈ `touchTypes`) the chosen
    * `model` picks from the user's strictly-earlier history: `"last"`
    * (last-touch, the default marketing model) or `"first"`
    * (first-touch). A conversion whose picked touch is missing or
    * older than `lookbackDays` attributes to `"(none)"` — unattributed
    * mass must stay VISIBLE, not vanish from the denominator. Output:
    * (channel, n_conversions, attributed_value), channel = the touch's
    * event type.
    *
    * Scale shape: ONE user-partitioned ordered window computes both
    * the picked touch's type and timestamp (same frame, one WindowExec
    * pass) — no conversion×touch self-join, which is the naive
    * formulation's quadratic trap on a hot user. Partitions are
    * per-user bounded; value mass sums as exact integer cents
    * (IEEE-exact in any engine); `idCol` breaks same-timestamp ties so
    * the pick is total-order deterministic.
    */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String, model: String = "last",
      lookbackDays: Int = 30): DataFrame = {
    require(model == "last" || model == "first",
      s"attribution model must be 'last' or 'first', got '$model'")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and exclude the conversion type")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    def pick(c: Column): Column =
      if (model == "last") last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    // both picks in ONE projection → one WindowExec pass (sequential
    // withColumn calls planned two Window nodes over the same sort)
    val flagged = df
      .select(col(typeCol), col(tsCol), col(valueCol),
        pick(when(isTouch, col(typeCol))).as("__touch_type"),
        pick(when(isTouch, unix_micros(col(tsCol)))).as("__touch_us"))
    val lookbackUs = lookbackDays.toLong * 86400000000L
    flagged.filter(col(typeCol) === convType)
      .select(
        coalesce(
          when(col("__touch_us") >= unix_micros(col(tsCol)) - lookbackUs,
            col("__touch_type")),
          lit("(none)")).as("channel"),
        floor(col(valueCol).cast("double") * 100.0 + 0.5).cast("long").as("__cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        (sum(col("__cents")).cast("double") / 100.0).as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** Retention cohorts: cohort = the user's first activity bucket
    * (`bucket` ∈ day|week), cell = distinct users of that cohort active
    * `offset` buckets later. Output: (cohort, offset, n_active).
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      bucket: String): DataFrame = {
    val days = bucket match {
      case "week" => 7
      case "day" => 1
      case other => throw new IllegalArgumentException(
        s"unsupported retention bucket: $other")
    }
    val ev = df.select(col(userCol).as("user_id"),
      date_trunc(bucket, col(tsCol)).as("bucket"))
    val first = ev.groupBy(col("user_id")).agg(min(col("bucket")).as("cohort"))
    ev.join(first, Seq("user_id"))
      .groupBy(col("cohort"),
        (datediff(col("bucket"), col("cohort")) / days).cast("long").as("offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }
}
