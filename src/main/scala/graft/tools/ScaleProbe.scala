package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Graph}

/** Empirical scaling-exponent probe for the pair/graph family
  * (dd2 MinHash-LSH pairs, pj1 exact prefix-filtered Jaccard join,
  * cc1 alternating-star components, tr1 degree-ordered triangles).
  *
  * sf0.1 correctness runs cannot DISTINGUISH a banded/O(m^1.5) plan
  * from a quadratic one — both finish in seconds. This probe can: it
  * synthesizes a clustered near-dup corpus whose true pair count grows
  * LINEARLY in n (fixed-size clusters of 4 mutually-near-dup docs, so
  * pairs = 1.5n, triangles = n), times each operator at n and 4n, and
  * reports the measured exponent log4(t₄ₙ/tₙ). A banded/linear plan
  * reads ≲1.3 (fixed costs drag it below 1); a quadratic candidate
  * stage reads ≈2. Results are recorded in PLANS.md per round 9.
  *
  * Corpus: doc id belongs to cluster id/4; each doc is 40 cluster-
  * scoped tokens with ONE variant-specific position mutated, so
  * within-cluster Jaccard = 38/42 ≈ 0.905 (≥ the 0.9 threshold) and
  * cross-cluster similarity is 0 — the density knob stays fixed as n
  * grows, which is what makes the exponent attributable to the PLAN.
  */
object ScaleProbe {

  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id",
      "array_join(transform(sequence(0, 39), w -> concat('c', cast(id div 4 as string), '_', " +
        "cast(CASE WHEN w = (id % 4) * 7 THEN 9999 + id % 4 ELSE w END as string))), ' ') AS text")

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val small = args.headOption.map(_.toLong).getOrElse(3000L)
    val factor = 4L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ops(docs: DataFrame): Seq[(String, () => Long)] = {
      // EAGER, outside any timed thunk: cc1/tr1 must measure their own
      // scaling, not free-ride on (or get charged for) the pair
      // generation that dd2 already measures separately
      val pairs = Dedup.minHashNearDupPairs(docs, "id", "text",
        threshold = 0.9).localCheckpoint(true)
      Seq(
        "dd2_minhash_pairs" -> (() =>
          Dedup.minHashNearDupPairs(docs, "id", "text", threshold = 0.9).count()),
        "pj1_prefix_jaccard" -> (() =>
          Dedup.prefixJaccardPairs(docs, "id", "text", threshold = 0.9).count()),
        "cc1_star_components" -> (() =>
          Dedup.alternatingStarComponents(pairs, docs.select(col("id")), "id").count()),
        "tr1_triangles" -> (() => Graph.triangleCounts(pairs).count()))
    }

    // JIT/codegen warmup on a tiny corpus, untimed
    ops(corpus(spark, 400).localCheckpoint(true)).foreach(_._2())

    val results = Seq(small, small * factor).map { n =>
      val docs = corpus(spark, n).localCheckpoint(true)
      n -> ops(docs).map { case (name, f) =>
        val (secs, rows) = timed(f())
        (name, secs, rows)
      }
    }
    val Seq((n1, r1), (n2, r2)) = results
    val lines = r1.zip(r2).map { case ((name, t1, c1), (_, t2, c2)) =>
      val exp = math.log(t2 / t1) / math.log(factor.toDouble)
      f""""$name":{"t_$n1%d":$t1%.2f,"t_$n2%d":$t2%.2f,"rows_$n1%d":$c1,"rows_$n2%d":$c2,"exponent":$exp%.2f}"""
    }
    println("{" + lines.mkString(",") + "}")
    spark.stop()
  }
}
