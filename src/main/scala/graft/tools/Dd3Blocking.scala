package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Candidate-volume evidence for dd3's blocking schemes (round 16,
  * VERDICT item 5): counts Σ n·(n−1)/2 over the posting lists of the
  * single-8-bit-chunk scheme vs the two-chunk 16-bit scheme, plus the
  * true pair count, at the given SF.
  *
  * Usage: runMain graft.tools.Dd3Blocking <sfDir>
  */
object Dd3Blocking {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sims = docs.select(col("doc_id").as("id"),
      Dedup.simHash32(col("text")).as("sh")).localCheckpoint(true)
    def chunk(c: Int) = shiftright(col("sh"), c * 8).bitwiseAND(255)

    def pairsPerBlock(keys: org.apache.spark.sql.Column, label: String): Unit = {
      val agg = sims.select(explode(keys).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
          count(lit(1)).as("n_blocks"), max(col("n")).as("max_list"))
        .head()
      println(s"[dd3] $label: candidate_pairs=${agg.get(0)} " +
        s"blocks=${agg.get(1)} max_posting_list=${agg.get(2)}")
    }
    pairsPerBlock(array((0 until 4).map(c =>
      concat_ws(":", lit(c), chunk(c))): _*), "single-chunk (4 x 8-bit)")
    val combos = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    pairsPerBlock(array(combos.zipWithIndex.map { case ((c1, c2), p) =>
      lit(p.toLong * (1L << 16)) + chunk(c1) * 256 + chunk(c2)
    }: _*), "two-chunk (6 x 16-bit)")
    val trueN = Dedup.simHashNearDupPairs(docs, "doc_id", "text", 2).count()
    println(s"[dd3] true pairs (hamming<=2): $trueN")
    spark.stop()
  }
}
