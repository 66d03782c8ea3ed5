package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches with ENGINE-PORTABLE determinism.
  *
  * The usual objection to oracle-checking a sketch is that every engine
  * ships its own hash and register layout. This HyperLogLog derives its
  * registers from md5 (like every semantic hash in this library) and
  * keeps ALL arithmetic in exact integer space until one final
  * correctly-rounded IEEE division — so the estimate, not just the
  * exact count, hash-matches an independent SQL restatement.
  *
  * Scale: one narrow map-side projection + a 256-row groupBy — the
  * cheapest possible cardinality estimate at 100 TB (the shuffle carries
  * at most m=256 partial registers per partition, constant in input
  * size; contrast with exact COUNT DISTINCT, whose shuffle is linear in
  * the number of distinct values).
  */
object Sketches {

  val M = 256            // registers
  val RestBits = 53      // rest = h div 256 is 52 bits -> rho = 53 - bitlen in [1, 53]

  /** Bloom filter build: `mBits` bits as 32-bit words (32, not 64, so
    * a set bit is always a positive BIGINT in any engine), `k`
    * md5-derived hash rows. Output: (word, bits) — mBits/32 rows.
    * Scale: the filter is constant-size; partial bit_or makes the
    * shuffle O(words) per partition.
    */
  def bloomBuild(df: DataFrame, valueCol: Column, mBits: Int, k: Int): DataFrame =
    df.select(explode(array((0 until k).map(r =>
        pmod(Dedup.hash60(concat_ws("|", lit(r.toString), valueCol.cast("string"))),
          lit(mBits.toLong)).as(s"p$r")): _*)).as("p"))
      .select((col("p") / 32).cast("long").as("word"), pmod(col("p"), lit(32L)).as("bit"))
      .groupBy(col("word"))
      .agg(bit_or(expr("shiftleft(cast(1 as bigint), cast(bit as int))")).as("bits"))

  /** Bloom membership probe: true iff all `k` bit positions are set.
    * The filter (mBits/32 rows) broadcasts; probes stay partitioned.
    */
  def bloomProbe(filter: DataFrame, probes: DataFrame, probeCol: String,
      mBits: Int, k: Int): DataFrame = {
    val pb = probes.select(col(probeCol), posexplode(array((0 until k).map(r =>
        pmod(Dedup.hash60(concat_ws("|", lit(r.toString), col(probeCol).cast("string"))),
          lit(mBits.toLong))): _*)).as(Seq("r", "p")))
      .select(col(probeCol), (col("p") / 32).cast("long").as("word"),
        pmod(col("p"), lit(32L)).as("bit"))
    pb.join(broadcast(filter), Seq("word"), "left")
      .select(col(probeCol),
        (coalesce(expr("(shiftright(bits, cast(bit as int)) & 1)"), lit(0L)) === 1L)
          .as("bit_set"))
      .groupBy(col(probeCol))
      .agg((sum(when(col("bit_set"), 1L).otherwise(0L)) === k).as("maybe_member"))
  }

  /** Raw HLL-256 cardinality estimate (no small/large-range correction
    * — those need ln(), which is not correctly-rounded across libm
    * implementations, so they would break the cross-engine hash match).
    * Output: one row (hll_estimate, buckets_used, max_register).
    *
    * rho uses bin()-length, not floor(log2(x)): log2 in double rounds
    * UP to exactly k for x just below 2^k (k ≳ 50), which would
    * misplace a register; bin() is exact in any engine.
    *
    * Exactness argument for the estimate: register terms are summed as
    * integers 2^(53-r) (max total 511·2^52 < 2^61, no overflow for
    * non-empty input); alpha·m²·2^53 / total runs in correctly-rounded
    * IEEE ops in a fixed association order — identical on any engine.
    */
  /** Count-min sketch table: `d` hash rows × `w` buckets of exact
    * counts. Same portability idea as the HLL: row hashes are
    * md5-derived, counts are integers, so any engine rebuilds the
    * identical table. Shuffle is O(d·w) per partition after partial
    * aggregation — constant in input size.
    */
  def countMinTable(df: DataFrame, valueCol: Column, d: Int, w: Int): DataFrame =
    // spread the raw key column before the d·|rows| md5 pass (round 16:
    // a one-row-group file scans as one task, serializing the hashing;
    // spreadForCompute is a no-op whenever the scan is already parallel,
    // so the 100 TB plan never gains a key shuffle)
    Dedup.spreadForCompute(df.select(valueCol.cast("string").as("__v")), col("__v"))
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          pmod(Dedup.hash60(concat_ws("|", lit(r.toString), col("__v"))),
            lit(w.toLong)).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Count-min merge: cell-wise ADD — per-partition / per-day tables
    * roll up into exactly the table a global pass builds.
    */
  def countMinMerge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))

  /** Join-size estimate from two count-min tables (the
    * Cormode-Muthukrishnan inner-product estimate): |A ⋈ₖ B| ≲ min over
    * rows r of Σ_b cmA[r][b]·cmB[r][b] — an upper bound, exact when no
    * two distinct keys share a bucket in the minimizing row. The
    * optimizer-statistics primitive: two constant-size sketches, built
    * independently per table (and mergeable per ingest slice via
    * [[countMinMerge]]), answer the join-cardinality question without
    * touching either table — what a cost-based planner consults before
    * choosing a join strategy at 100 TB.
    */
  def countMinJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val dots = a.withColumnRenamed("c", "__ca")
      .join(b.withColumnRenamed("c", "__cb"), Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("__ca") * col("__cb")).as("__dot"))
    // a hash row with NO overlapping buckets proves the join empty —
    // its dot is 0 and must participate in the min (an inner-join-only
    // min would skip it and report a positive estimate, or NULL when
    // every row is overlap-free). `a` carries all d rows by
    // construction (countMinTable emits every r per input row).
    a.select(col("r")).distinct()
      .join(dots, Seq("r"), "left")
      .agg(coalesce(min(coalesce(col("__dot"), lit(0L))), lit(0L))
        .as("cm_join_estimate"))
  }

  /** Bloom merge: word-wise bit OR — the union filter of the inputs. */
  def bloomMerge(filters: DataFrame*): DataFrame =
    filters.reduce(_ unionByName _)
      .groupBy(col("word")).agg(bit_or(col("bits")).as("bits"))

  /** Point estimates from a count-min table for the given probe values:
    * min over the d rows of the probed bucket counts (classic CM upper
    * bound; exact when no collisions). `probes` must be small (it is
    * broadcast against the d·w-row table).
    */
  def countMinEstimate(table: DataFrame, probes: DataFrame, probeCol: String,
      d: Int, w: Int): DataFrame = {
    val probeBuckets = probes.select(col(probeCol), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          pmod(Dedup.hash60(concat_ws("|", lit(r.toString), col(probeCol).cast("string"))),
            lit(w.toLong)).as("bucket"))): _*)).as("rb"))
      .select(col(probeCol), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    broadcast(probeBuckets).join(table, Seq("r", "bucket"))
      .groupBy(col(probeCol))
      .agg(min(col("c")).as("cm_estimate"))
  }

  /** Per-row (…carry, bucket, rho) leading-zero observations — ONE
    * derivation shared by the direct and grouped register builders, so
    * the merged-equals-direct invariant can't drift.
    */
  private def hllObservations(
      df: DataFrame, valueCol: Column, carry: Seq[Column] = Nil): DataFrame =
    df.select(carry :+ Dedup.hash60(valueCol.cast("string")).as("h"): _*)
      .select(carry ++ Seq(pmod(col("h"), lit(M.toLong)).as("bucket"),
        expr(s"h div $M").as("rest")): _*)
      .select(carry ++ Seq(col("bucket"), when(col("rest") === 0, lit(RestBits))
        .otherwise(lit(RestBits) - length(bin(col("rest")))).as("rho")): _*)

  /** Per-group register tables: (g, bucket, max rho) — the shippable
    * sketch state, ≤ M rows per group, mergeable by bucket-wise max.
    */
  def hllGroupedRegisters(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    hllObservations(df.select(groupCol.as("g"), valueCol.as("__v")),
        col("__v"), carry = Seq(col("g")))
      .groupBy(col("g"), col("bucket")).agg(max(col("rho")).as("r"))

  /** THE HLL merge: bucket-wise max across register tables — the
    * property that lets per-partition / per-day sketches roll up
    * without re-reading data.
    */
  def hllMergeRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("r")).as("r"))

  /** One HLL estimate PER group (vs [[hllMergedDistinct]], which merges
    * the group sketches into a single global estimate) — the
    * "distinct users per segment" rollup. Scale shape: the exchange
    * carries ≤ M register rows per group (the map-side max over
    * (g, bucket) collapses values first), never the value stream, and
    * the per-group state is constant-size, so a 100 TB corpus with a
    * million segments shuffles ≤ M·|segments| rows.
    */
  def hllDistinctBy(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    hllGroupedRegisters(df, groupCol, valueCol)
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("used"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast($RestBits - r as int))")).as("dsum"),
        max(col("r")).as("maxr"))
      .select(col("g"),
        TextAnalysis.round6(
          lit(alpha * (M.toDouble * M) * math.pow(2.0, RestBits)) /
            (col("dsum") + (lit(M.toLong) - col("used"))
              * expr(s"shiftleft(cast(1 as bigint), $RestBits)")).cast("double"))
          .as("hll_estimate"),
        col("used").cast("long").as("buckets_used"),
        col("maxr").cast("long").as("max_register"))
  }

  /** Estimate via grouped sketches + merge — by the merge property,
    * identical output to [[hllDistinct]] on the same data.
    */
  def hllMergedDistinct(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    hllFinish(hllMergeRegisters(hllGroupedRegisters(df, groupCol, valueCol)))

  /** One slice's register table (bucket, r) — merge with
    * [[hllMergeRegisters]], finalize with [[hllEstimate]].
    */
  def hllRegisters(df: DataFrame, valueCol: Column): DataFrame =
    hllObservations(df, valueCol)
      .groupBy(col("bucket")).agg(max(col("rho")).as("r"))

  def hllDistinct(df: DataFrame, valueCol: Column): DataFrame =
    hllFinish(hllRegisters(df, valueCol))

  /** Finalize a register table into the estimate row. */
  def hllEstimate(regs: DataFrame): DataFrame = hllFinish(regs)

  private def hllFinish(regs: DataFrame): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    regs.agg(
        count(lit(1)).as("used"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast($RestBits - r as int))")).as("dsum"),
        max(col("r")).as("maxr"))
      .select(
        TextAnalysis.round6(
          lit(alpha * (M.toDouble * M) * math.pow(2.0, RestBits)) /
            (col("dsum") + (lit(M.toLong) - col("used"))
              * expr(s"shiftleft(cast(1 as bigint), $RestBits)")).cast("double"))
          .as("hll_estimate"),
        col("used").cast("long").as("buckets_used"),
        col("maxr").cast("long").as("max_register"))
  }

  // ---- KMV / theta distinct sketches -------------------------------------

  /** KMV distinct sketch per group: the k smallest DISTINCT 60-bit
    * element hashes, via the bounded [[graft.functions.MinK]] aggregator
    * (≤2k-row partials — the exchange carries k·partials, never the
    * distinct set, which is `collect_set`'s failure mode at 100 TB).
    * When a group has fewer than k distinct elements the sketch IS the
    * distinct set and the estimator is exact; beyond k it's
    * (k−1)·2⁶⁰/θ with θ = the kth minimum (Bar-Yossef et al. '02).
    * Unlike HLL registers, KMV sketches compose under set INTERSECTION
    * ([[thetaIntersect]]) — the reason to carry both sketch families.
    */
  def kmvGroupedSketch(df: DataFrame, groupCol: Column, elementCol: Column,
      k: Int): DataFrame =
    df.select(groupCol.as("g"), Dedup.hash60(elementCol.cast("string")).as("h"))
      .groupBy(col("g"))
      .agg(graft.functions.MinK.minKDistinct(k)(col("h")).as("kmv"))

  /** KMV merge: union sketch = k smallest distinct values of the
    * concatenation — same bounded-prune semantics as build, so
    * sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) exactly.
    */
  def kmvMergeAll(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(explode(col("kmv")).as("h"))
      .agg(graft.functions.MinK.minKDistinct(k)(col("h")).as("kmv"))

  private val TwoPow60 = math.pow(2.0, 60) // exactly representable

  /** Distinct estimate from a KMV sketch column. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(TextAnalysis.round6(
        lit((k - 1).toDouble * TwoPow60) / element_at(kmv, k).cast("double")))

  /** Theta-sketch intersection estimate between two same-k KMV
    * sketches: θ = min of the two kth minima (2⁶⁰ when a side is
    * exact), estimate = |{x ∈ A∩B : x < θ}| · 2⁶⁰ / θ — exact when
    * both sides are exact (θ = 2⁶⁰ makes the scale factor 1). The
    * arithmetic is a long comparison plus one IEEE double division, so
    * the estimate is engine-reproducible to the bit.
    */
  def thetaIntersect(a: Column, b: Column, k: Int): Column = {
    def theta(s: Column) =
      when(size(s) < k, lit(1L << 60)).otherwise(element_at(s, k))
    val th = least(theta(a), theta(b))
    val common = size(filter(array_intersect(a, b), x => x < th))
    TextAnalysis.round6(common.cast("double") * lit(TwoPow60) / th.cast("double"))
  }

  /** EXACT heavy hitters (values with frequency > `phiBp`/10000 of all
    * rows) via the textbook two-pass scheme over a bounded sketch:
    *
    *  1. one scan folds every partition into a Misra-Gries summary
    *     ([[graft.functions.FreqSketch]]) — the exchange carries ≤ k
    *     entries per partial, never the value set. The merged summary
    *     is GUARANTEED to contain every value above n/(k+1), so with
    *     `k + 1 > 10000 / phiBp` no qualifying value can be lost;
    *  2. a second scan counts ONLY the ≤ k candidates exactly (the
    *     candidate set broadcasts; non-candidate rows drop map-side
    *     before the shuffle) and keeps those above the threshold.
    *
    * The result is exactly `GROUP BY v HAVING count > n·φ` — but no
    * stage ever groups the full value domain, the property that
    * survives a 100 TB column with billions of distinct values where
    * the direct GROUP BY's exchange is the bottleneck. Threshold
    * compare is all-integer (`cnt·10000 > n·phiBp`), engine-exact.
    */
  def heavyHittersExact(
      df: DataFrame, valueCol: Column, phiBp: Int, k: Int): DataFrame = {
    require((k + 1).toLong * phiBp > 10000L,
      s"heavyHittersExact: k=$k too small for phi=$phiBp/10000 — " +
        "the Misra-Gries superset guarantee needs (k+1)*phiBp > 10000")
    // nulls are excluded from the frequency domain up front: the MG
    // sketch skips them anyway, and the candidate semi-join below is
    // null-unsafe — filtering here keeps n consistent with what pass 2
    // can actually count
    val vals = df.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull)
    // candidates AND the total ride pass 1 together — a separate
    // count() would be a third full-column scan
    val pass1 = vals
      .agg(graft.functions.FreqSketch.misraGries(k)(col("v")).as("mg"),
        count(lit(1)).as("__n"))
      .localCheckpoint(true) // one row, feeds candidates + threshold
    val candidates = pass1.select(explode(col("mg")).as("e"))
      .select(col("e._1").as("v"))
    val total = pass1.select(col("__n"))
    vals.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 10000L > col("__n") * phiBp)
      .select(col("v"), col("cnt"))
  }

  /** Mergeable binned-quantile sketch — the fourth standard sketch next
    * to HLL / count-min / Bloom: values histogram into fixed-width bins
    * (one count shuffle, constant-size state, bin counts merge by
    * addition across any partitioning), and a quantile p reads off the
    * upper bound of the first bin whose cumulative count reaches p·N.
    * Error is bounded by `width` by construction. Engine-exact: IEEE
    * double division + floor for binning, integer cumulative counts,
    * and the p·N threshold compares integer cum against the same double
    * on every engine. The cumulative pass runs on the BOUNDED bin table
    * (|range|/width rows), one coalesced partition with a declared
    * partition key — the withBoundedRank pattern, never an
    * unpartitioned window over data-sized input.
    */
  def binQuantiles(
      df: DataFrame, valueCol: String, width: Double, ps: Seq[Double]): DataFrame =
    quantilesFromBins(
      df.select(floor(col(valueCol).cast("double") / width).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("c")),
      width, ps)

  /** The bins → quantiles half of [[binQuantiles]], callable on an
    * already-materialized (bin, c) table — the shape a cross-trigger
    * maintainer stores ([[graft.streaming.QuantileMonitor]]): bin
    * counts are ADDITIVE, so the folded table is exactly what one
    * batch scan would have produced.
    */
  def quantilesFromBins(
      bins0: DataFrame, width: Double, ps: Seq[Double]): DataFrame = {
    // the source is scanned ONCE: the bounded bin table materializes
    // eagerly, and every quantile branch (plus the total) reads the
    // checkpointed bins, not the input
    val bins = bins0.select(col("bin"), col("c")).localCheckpoint(true)
    val one = bins.coalesce(1).withColumn("__bq_pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__bq_pid"))
      .orderBy(col("bin")).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = one.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(bins.agg(sum(col("c")).cast("double").as("n"))))
    ps.map { p =>
      cum.filter(col("cum") >= lit(p) * col("n"))
        .agg(min(col("bin")).as("bin"))
        .select(lit(p).as("p"),
          ((col("bin") + 1).cast("double") * width).as("estimate"))
    }.reduce(_ unionByName _)
  }
}
