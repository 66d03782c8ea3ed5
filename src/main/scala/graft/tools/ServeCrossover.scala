package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the serve-tail crossover (PLANS.md §10) — the
  * `row_number` window vs the bounded-heap aggregator on the SAME
  * stored-index serve, at small and large probe sets.
  */
object ServeCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    println(s"corpus: $n vectors")
    graft.sources.AnnIndex.buildLsh(emb, "crossover_lsh",
      planes = 6, dims = 64, buckets = 8)
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e3, rows)
      }.zipWithIndex.foreach { case ((us, rows), i) =>
        if (i == 2) println(f"$label%-40s ${us / 1000}%8.0f ms  ($rows rows)")
      }
    }
    for (probes <- Seq(5L, 2000L); agg <- Seq(true, false)) {
      val q = emb.filter(col("vec_id") < probes)
      time(s"small-cands probes=$probes aggRank=$agg") {
        graft.sources.AnnIndex.lshServe(spark, "crossover_lsh", q,
          k = 10, planes = 6, dims = 64, aggRank = agg).count()
      }
    }
    // large-candidate regime: 50x-replicated corpus, 4 coarse buckets
    // => ~25k candidates per query — the volume the aggregator exists for
    val big = (0 until 50).map(i => emb.select(
      (col("vec_id") + i * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_.unionAll(_))
    graft.sources.AnnIndex.buildLsh(big, "crossover_big",
      planes = 2, dims = 64, buckets = 8)
    for (probes <- Seq(200L, 2000L); agg <- Seq(true, false)) {
      val q = emb.filter(col("vec_id") < probes)
      time(s"big-cands probes=$probes aggRank=$agg") {
        graft.sources.AnnIndex.lshServe(spark, "crossover_big", q,
          k = 10, planes = 2, dims = 64, aggRank = agg).count()
      }
    }
    spark.stop()
  }
}
