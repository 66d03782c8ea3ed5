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

  /** The serve tails must rank through the bounded-heap aggregator —
    * never a Window, whose exchange would carry the (unbounded at
    * serve time) scored candidate set instead of k·partials.
    */
  private def assertNoWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    val exec = df.queryExecution.executedPlan
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"serve tail must rank via bounded aggregation, found a Window:\n$inner")
  }

  test("lshServe over the stored index equals inline lshTopK") {
    AnnIndex.buildLsh(emb, "annspec_lsh", planes = 6, dims = 64, buckets = 4)
    val served = AnnIndex.lshServe(spark, "annspec_lsh",
      emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
    val inline = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, planes = 6, dims = 64)
    assert(served.collect().toSet == inline.collect().toSet)
    assertNoWindow(served)
  }

  test("ivfServe over stored lists + stored centroids equals inline ivfTopK") {
    AnnIndex.buildIvf(emb, "annspec_ivf", nCentroids = 8, refine = 1, buckets = 4)
    val served = AnnIndex.ivfServe(spark, "annspec_ivf",
      emb.filter(col("vec_id") < 5), k = 10, nProbe = 2)
    val inline = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, nCentroids = 8, nProbe = 2)
    assert(served.collect().toSet == inline.collect().toSet)
    assertNoWindow(served)
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
      assertNoWindow(served)
      // and the bucketed path returns the same rows as the inline operator
      val inline = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
        k = 10, planes = 6, dims = 64)
      assert(served.collect().toSet == inline.collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
