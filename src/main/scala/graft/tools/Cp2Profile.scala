package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev-only: per-tier wall attribution for cp2_dedup_ladder — times
  * each tier's survivor-frame materialization in isolation (after the
  * shared pair cache is warm) so a cp2 regression can be blamed on a
  * tier, not the composite. Usage: runMain graft.tools.Cp2Profile [sf].
  */
object Cp2Profile {
  def main(args: Array[String]): Unit = {
    if (SelfFork.reexecIfWrapped("graft.tools.Cp2Profile", args)) return
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    def t(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = f.localCheckpoint(true)
      val n = df.count()
      println(f"[cp2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      df
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val pairs = t("pairs (minhash, cold)")(
      Dedup.minHashNearDupPairs(docs, "doc_id", "text", k = 32, bands = 8, threshold = 0.9))
    val s1 = t("tier1 exact")(
      Dedup.exactDedup(docs, "doc_id", "text").select(col("doc_id")))
    val rej2 = t("tier2 rej (pair semi-joins)")(pairs
      .join(s1.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
      .join(s1.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_b").as("doc_id")).distinct())
    val s2 = t("tier2 anti")(s1.join(rej2, Seq("doc_id"), "left_anti"))
    val cov = t("tier3 span coverage")(
      Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 8, minDocs = 2)
        .select(col("doc_id"), col("dup_frac")))
    val s3 = t("tier3 gate")(s2.join(cov, Seq("doc_id"))
      .filter(col("dup_frac") <= 0.3).select(col("doc_id")))
    val emb3 = graft.Tables.load(spark, dir, "embeddings")
      .join(s3.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val s4 = t("tier4 semantic")(
      Similarity.semDedup(emb3, nCentroids = 8, refine = 1, threshold = 0.35)
        .select(col("vec_id")))
    println(s"[cp2] done: ${s4.count()} survivors")
    spark.stop()
  }
}
