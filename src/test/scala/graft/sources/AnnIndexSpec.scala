package graft.sources

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The persisted-index contract: serve-time results are identical to
  * the inline operators, and the co-bucketed batch-serve join plans
  * with ZERO exchanges — the property that makes the build/serve split
  * worth its write-time shuffle at 100 TB.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = graft.Tables.load(spark, sfSmoke, "embeddings")

  /** Full physical traversal that DESCENDS INTO AQE query stages —
    * `plan.collect` stops at stage boundaries, which silently turns
    * any node assertion on an adaptive plan into a vacuous pass.
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  /** The serve tails must rank the CANDIDATE set through the
    * bounded-heap aggregator — never a Window, whose exchange would
    * carry the (unbounded at serve time) scored candidates instead of
    * k·partials. The only windows allowed are the `probeWindows`
    * query-side probe-selection ranks (tiny: |queries|·C rows).
    */
  private def assertAggRankTail(
      df: org.apache.spark.sql.DataFrame, probeWindows: Int): Unit = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length == probeWindows,
      s"expected $probeWindows probe-selection window(s), got ${windows.length}:\n" +
        windows.mkString("\n"))
    windows.foreach(w => assert(
      w.orderSpec.exists(_.child.toString.contains("cent_sim")),
      s"the only allowed window is centroid probe selection, found:\n$w"))
    assert(nodes.exists(_.toString.contains("topkbyscore")),
      "serve tail must rank via the bounded-heap aggregator")
  }

  test("lshServe over the stored index equals inline lshTopK") {
    AnnIndex.buildLsh(emb, "annspec_lsh", planes = 6, dims = 64, buckets = 4)
    val served = AnnIndex.lshServe(spark, "annspec_lsh",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
    val inline = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, planes = 6, dims = 64)
    assert(served.collect().toSet == inline.collect().toSet)
    assertAggRankTail(served, probeWindows = 0)
  }

  test("lshServeMultiProbe over the stored index equals inline lshTopKMultiProbe") {
    AnnIndex.buildLsh(emb, "annspec_lshmp", planes = 6, dims = 64, buckets = 4)
    val served = AnnIndex.lshServeMultiProbe(spark, "annspec_lshmp",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64, nProbe = 3)
    val inline = Similarity.lshTopKMultiProbe(emb, emb.filter(col("vec_id") < 5),
      k = 10, planes = 6, dims = 64, nProbe = 3)
    assert(served.collect().toSet == inline.collect().toSet)
    assertAggRankTail(served, probeWindows = 0)
    // multi-probe must actually widen recall over single-probe at the
    // same stored index (the fixture straddles hyperplanes, so equal
    // results would mean the probe expansion is dead code)
    val single = AnnIndex.lshServe(spark, "annspec_lshmp",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
    assert(served.count() >= single.count(),
      "multi-probe can never return fewer neighbors than single-probe")
    assert(served.collect().toSet != single.collect().toSet,
      "fixture must exercise at least one flipped-bucket hit")
  }

  test("ivfServe over stored lists + stored centroids equals inline ivfTopK") {
    AnnIndex.buildIvf(emb, "annspec_ivf", nCentroids = 8, refine = 1, buckets = 4)
    val served = AnnIndex.ivfServe(spark, "annspec_ivf",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2)
    val inline = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, nCentroids = 8, nProbe = 2)
    assert(served.collect().toSet == inline.collect().toSet)
    // round 15: probe selection is the packed nearest_centroids kernel
    // (no window at all) — the serve tail must be window-free
    assertAggRankTail(served, probeWindows = 0)
  }

  test("ivfDriftReport flags a drifted append and accumulates across appends") {
    AnnIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), "annspec_drift",
      nCentroids = 8, refine = 1, buckets = 4)
    def report() = AnnIndex.ivfDriftReport(spark, "annspec_drift")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap

    // append 1: same distribution (the odd half of the same corpus)
    AnnIndex.appendIvf(emb.filter(col("vec_id") % 2 === 1), "annspec_drift")
    val sameDist = report()
    val (bn, bMean, bP10) = sameDist("build")
    val (n1, sameMean, _) = sameDist("append")
    assert(n1 == emb.filter(col("vec_id") % 2 === 1).count())

    // append 2: genuinely drifted vectors — a norm shift (the
    // new-encoder-version scenario) shrinks every assigned dot 10×
    AnnIndex.appendIvf(
      emb.filter(col("vec_id") % 2 === 1)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), v => (v * lit(0.1d)).cast("float"))
            .as("embedding")),
      "annspec_drift")
    val drifted = report()
    val (n2, driftMean, dP10) = drifted("append")
    assert(n2 == 2 * n1, "append-scope rows must accumulate across appends")
    assert(drifted("build") == ((bn, bMean, bP10)), "build scope must not move")
    assert(driftMean < sameMean,
      s"drifted append must pull the mean down: $driftMean vs $sameMean")
    assert(driftMean < bMean && dP10 <= bP10,
      s"signal must show append ($driftMean, p10=$dP10) below build ($bMean, p10=$bP10)")
  }

  test("maybeRebuild consumes the drift signal: no-op below threshold, " +
    "fires exactly once past it, rebuilt index ≡ direct build over the union") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val driftedBatch = odds.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), v => (v * lit(0.1d)).cast("float"))
        .as("embedding"))
    // measured on the smoke fixture: a same-distribution append scores
    // a mean-dot gap of ~0.03 vs build (assignment against the other
    // half's centroids), the 10×-shrunk batch ~0.078 — 0.05 splits the
    // two with ~1.7× margin each way
    val gap = 0.05

    // same-distribution append: signal stays below threshold → no-op,
    // and the 'append' scope survives (nothing reset)
    AnnIndex.buildIvf(evens, "annspec_mr0", nCentroids = 8, refine = 1, buckets = 4)
    AnnIndex.appendIvf(odds, "annspec_mr0")
    val listRowsBefore = spark.table("annspec_mr0").count()
    assert(!AnnIndex.maybeRebuild(spark, "annspec_mr0",
      minMeanGap = gap, minP10Gap = 5, nCentroids = 8, refine = 1, buckets = 4))
    assert(spark.table("annspec_mr0").count() == listRowsBefore)
    assert(spark.table("annspec_mr0_drift")
      .filter(col("scope") === "append").count() > 0,
      "a no-op decision must leave the drift bookkeeping untouched")

    // drifted append (10× norm shift): mean gap blows past threshold →
    // rebuild fires, drift table resets to a fresh 'build' scope
    AnnIndex.buildIvf(evens, "annspec_mr", nCentroids = 8, refine = 1, buckets = 4)
    AnnIndex.appendIvf(driftedBatch, "annspec_mr")
    assert(AnnIndex.maybeRebuild(spark, "annspec_mr",
      minMeanGap = gap, minP10Gap = 5, nCentroids = 8, refine = 1, buckets = 4))
    assert(spark.table("annspec_mr_drift")
      .select(col("scope")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("build"),
      "rebuild must reset the drift table to a fresh build scope")
    // …exactly once: the reset cleared the episode, so the next call no-ops
    assert(!AnnIndex.maybeRebuild(spark, "annspec_mr",
      minMeanGap = gap, minP10Gap = 5, nCentroids = 8, refine = 1, buckets = 4))

    // the rebuilt index is IDENTICAL to building directly over the
    // union corpus (same deterministic retrain, same assignments)
    AnnIndex.buildIvf(
      evens.select(col("vec_id"), col("embedding")).unionByName(driftedBatch),
      "annspec_mr_direct", nCentroids = 8, refine = 1, buckets = 4)
    val probes = emb.filter(col("vec_id") < 5)
    val rebuilt = AnnIndex.ivfServe(spark, "annspec_mr", probes, k = 10, nProbe = 2)
    val direct = AnnIndex.ivfServe(spark, "annspec_mr_direct", probes, k = 10, nProbe = 2)
    assert(rebuilt.collect().toSet == direct.collect().toSet)
    assert(spark.table("annspec_mr").select(col("vec_id"), col("cent_id"))
        .collect().toSet
      == spark.table("annspec_mr_direct").select(col("vec_id"), col("cent_id"))
        .collect().toSet,
      "rebuilt list rows must match a direct build over the union")
  }

  test("ivfPqServe over stored lists+codes+codebooks equals inline ivfPqTopK") {
    AnnIndex.buildIvfPq(emb, "annspec_ivfpq", nCentroids = 8, refine = 1,
      m = 4, dims = 64, codebookK = 16, refinePq = 1, buckets = 4)
    val served = AnnIndex.ivfPqServe(spark, "annspec_ivfpq",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2, m = 4, dims = 64)
    val inline = Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, nCentroids = 8, nProbe = 2, m = 4, dims = 64, codebookK = 16)
    assert(served.collect().toSet == inline.collect().toSet)
    // round 15: packed-kernel probe selection — window-free serve tail
    assertAggRankTail(served, probeWindows = 0)
    // the stored-list side of the candidate join must stream straight
    // off its bucketed scan — no exchange, and no embedding column:
    // serve reads codes + the tiny trained artifacts, never the floats
    // streamed path only: broadcast BUILD subtrees (tiny probes/LUT —
    // their internal probe-selection shuffle is |queries|-sized and
    // intentional) are excluded from the no-exchange claim
    def streamedPath(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => Seq(b)
      case q: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec => Seq(q)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: streamedPath(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: streamedPath(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: streamedPath(r.child)
      case other => other +: other.children.flatMap(streamedPath)
    }
    def hasListScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      streamedPath(p).exists {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.tableIdentifier.exists(_.table == "annspec_ivfpq")
        case _ => false
      }
    // topmost scoring join streaming over the stored lists: from the
    // bucketed scan through candidate pruning + LUT scoring, not one
    // exchange — the first shuffle anywhere above carries aggregated
    // partials, never raw list rows
    val joins = allNodes(served.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if hasListScan(j) => j
    }
    assert(joins.nonEmpty,
      "the stored-list scan must stream into a broadcast candidate join")
    val path = streamedPath(joins.head)
    assert(!path.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      s"no exchange allowed between the stored-list scan and scoring:\n${joins.head}")
    val scanned = path.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.requiredSchema.fieldNames.toSet
    }
    assert(scanned.forall(cols => !cols.contains("embedding")),
      s"the corpus side must read codes, never the float vectors: $scanned")
  }

  test("appendLsh-then-serve is row-identical to rebuild-then-serve") {
    // SRP buckets are per-vector pure functions, so append is exact
    AnnIndex.buildLsh(emb.filter(col("vec_id") % 2 === 0), "annspec_lsh_app",
      planes = 6, dims = 64, buckets = 4)
    AnnIndex.appendLsh(emb.filter(col("vec_id") % 2 === 1), "annspec_lsh_app",
      planes = 6, dims = 64)
    val appended = AnnIndex.lshServe(spark, "annspec_lsh_app",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
    AnnIndex.buildLsh(emb, "annspec_lsh_reb", planes = 6, dims = 64, buckets = 4)
    val rebuilt = AnnIndex.lshServe(spark, "annspec_lsh_reb",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
    assert(appended.collect().toSet == rebuilt.collect().toSet)
  }

  test("appendIvf assigns against the STORED centroids: serve equals a " +
      "rebuild that assigns the union to the same centroids") {
    val half = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.buildIvf(half, "annspec_ivf_app", nCentroids = 8, refine = 1, buckets = 4)
    AnnIndex.appendIvf(emb.filter(col("vec_id") % 2 === 1), "annspec_ivf_app")
    val appended = AnnIndex.ivfServe(spark, "annspec_ivf_app",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2)
    // reference: same trained centroids (from the ORIGINAL half), whole
    // union assigned to them — composed from the public inline pieces
    val cents = Similarity.ivfCentroids(half, nCentroids = 8, refine = 1)
    val assigned = Similarity.assignToCentroids(emb, cents, "neighbor_id", "ce")
    val probes = Similarity.probeCentroids(emb.filter(col("vec_id") < 5), cents,
      "query_id", "qe", 2, "vec_id", "embedding")
    val expected = Similarity.rankTopK(
      broadcast(probes).join(assigned, Seq("cent_id")), 10, viaAggregator = true)
    assert(appended.collect().toSet == expected.collect().toSet)
  }

  test("appendIvfPq encodes against the stored codebooks: serve equals a " +
      "rebuild over the union with the same trained state") {
    val half = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.buildIvfPq(half, "annspec_ivfpq_app", nCentroids = 8, refine = 1,
      m = 4, dims = 64, codebookK = 16, refinePq = 1, buckets = 4)
    AnnIndex.appendIvfPq(emb.filter(col("vec_id") % 2 === 1), "annspec_ivfpq_app",
      m = 4, dims = 64)
    val appended = AnnIndex.ivfPqServe(spark, "annspec_ivfpq_app",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2, m = 4, dims = 64)
    // reference: a second index whose lists/codes are built in ONE pass
    // over the union against the SAME stored trained state — copy the
    // trained tables, then rebuild lists+codes from them
    Bucketing.resetTable(spark, "annspec_ivfpq_reb_cents")
    spark.table("annspec_ivfpq_app_cents").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable("annspec_ivfpq_reb_cents")
    Bucketing.resetTable(spark, "annspec_ivfpq_reb_cb")
    spark.table("annspec_ivfpq_app_cb").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable("annspec_ivfpq_reb_cb")
    val assigned = Similarity.assignToCentroids(emb,
        spark.table("annspec_ivfpq_reb_cents"), "neighbor_id", "ce")
      .select(col("neighbor_id"), col("cent_id"))
    val codes = Similarity.pqEncode(emb,
        spark.table("annspec_ivfpq_reb_cb"), "neighbor_id", 4, 64)
      .groupBy(col("neighbor_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
        x => x.getField("code")).as("codes"))
    Bucketing.writeBucketed(
      assigned.join(codes, Seq("neighbor_id"))
        .select(col("cent_id"), col("neighbor_id"), col("codes")),
      "annspec_ivfpq_reb", "cent_id", 4)
    val rebuilt = AnnIndex.ivfPqServe(spark, "annspec_ivfpq_reb",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2, m = 4, dims = 64)
    assert(appended.collect().toSet == rebuilt.collect().toSet)
  }

  test("co-bucketed batch serve: the candidate join plans ZERO exchanges") {
    AnnIndex.buildLsh(emb, "annspec_lsh2", planes = 6, dims = 64, buckets = 4)
    Bucketing.writeBucketed(
      emb.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), 6, 64).as("bucket")),
      "annspec_probes", "bucket", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val served = AnnIndex.lshServeBucketed(spark, "annspec_lsh2", "annspec_probes", 10)
      val exec = served.queryExecution.executedPlan
      val inner = exec match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joins = inner.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, s"expected a sort-merge candidate join:\n$inner")
      val shuffles = joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"co-bucketed serve join must not exchange either side:\n${joins.head}")
      assertAggRankTail(served, probeWindows = 0)
      // and the bucketed path returns the same rows as the inline operator
      val inline = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
        k = 10, planes = 6, dims = 64)
      assert(served.collect().toSet == inline.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
