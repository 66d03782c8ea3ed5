package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming quarantine split: passing rows to out, violators to
  * reject tagged with the FIRST failing constraint, exactly-once under
  * replay.
  */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val constraints = Seq(
    "not_null(v)" -> col("v").isNull,
    "in_range(v)" -> !col("v").between(0.0, 100.0),
    "in_set(flag)" -> !col("flag").isin("A", "B"))

  test("split + first-failing attribution + exactly-once replay") {
    val dir = Files.createTempDirectory("graft-qgate").toString
    val mem = MemoryStream[(Long, Option[Double], String)](spark)
    val q = QualityGate.start(mem.toDF().toDF("id", "v", "flag"), constraints,
      s"$dir/out", s"$dir/reject", s"$dir/ckpt",
      Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(
        (1L, Some(5.0), "A"),    // clean
        (2L, None, "Z"),         // null v AND bad flag → tagged not_null (first)
        (3L, Some(999.0), "B"),  // out of range
        (4L, Some(7.0), "C"))    // bad flag
      q.processAllAvailable()

      val out = spark.read.parquet(s"$dir/out")
        .select("id").as[Long].collect().toSet
      assert(out == Set(1L))
      val rejects = spark.read.parquet(s"$dir/reject")
        .select("id", "violated").as[(Long, String)].collect().toMap
      assert(rejects == Map(
        2L -> "not_null(v)", 3L -> "in_range(v)", 4L -> "in_set(flag)"),
        s"got $rejects")

      // replay the same epoch: no duplicates in either root
      QualityGate.applyBatch(spark,
        Seq((1L, Option(5.0), "A"), (2L, Option.empty[Double], "Z"),
          (3L, Option(999.0), "B"), (4L, Option(7.0), "C"))
          .toDF("id", "v", "flag"),
        batchId = 0, constraints, s"$dir/out", s"$dir/reject")
      assert(spark.read.parquet(s"$dir/out").count() == 1)
      assert(spark.read.parquet(s"$dir/reject").count() == 3)

      // an all-clean epoch commits an empty reject epoch dir (readers
      // never see a gap) and everything passes through
      mem.addData((5L, Some(1.0), "A"), (6L, Some(2.0), "B"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() == 3)
      assert(spark.read.parquet(s"$dir/reject").count() == 3)
    } finally q.stop()
  }

  test("perplexity-band expectation: docs score against a frozen trained LM") {
    import graft.ops.TextQuality
    val dir = Files.createTempDirectory("graft-qgate-lm").toString
    // the LM trains ONCE on the reference corpus and persists — the
    // gate's enrichment reads the stored table, never the training
    // lineage (the CCNet/Wenzek posture lm2 exercises in batch)
    graft.sources.Bucketing.resetTable(spark, "qgate_lm")
    TextQuality.trainBigramLm(
        Seq((100L, "the quick brown fox jumps over the lazy dog"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .write.format("parquet").saveAsTable("qgate_lm")
    val enrich: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      b => b.join(
        TextQuality.scoreAgainstLm(spark.table("qgate_lm"), b, "doc_id", "text"),
        Seq("doc_id"), "left")
    val band = Seq(
      // missing score (no bigrams) fails the band too — policy: a doc
      // the LM cannot score does not pass a perplexity expectation
      "fluency_band" -> (col("fluency6").isNull || col("fluency6") < 0.5))
    val mem = MemoryStream[(Long, String)](spark)
    val q = QualityGate.start(mem.toDF().toDF("doc_id", "text"), band,
      s"$dir/out", s"$dir/reject", s"$dir/ckpt",
      Trigger.ProcessingTime("0 seconds"), enrich = enrich)
    try {
      mem.addData(
        (1L, "the quick brown fox jumps"), // in-distribution: (the,quick)=1/2, rest 1/1 → 0.875
        (2L, "zyx qqq www eee"),           // token soup: all bigrams unseen → 0.0
        (3L, "solo"))                      // one token: no bigrams → null score
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
        .select("doc_id", "fluency6").as[(Long, Double)].collect().toMap
      assert(out == Map(1L -> 0.875), s"passing set drifted: $out")
      val rejects = spark.read.parquet(s"$dir/reject")
        .select("doc_id", "violated").as[(Long, String)].collect().toMap
      assert(rejects == Map(2L -> "fluency_band", 3L -> "fluency_band"),
        s"got $rejects")
      // the committed rows CARRY the enrichment (score visible downstream)
      assert(spark.read.parquet(s"$dir/reject")
        .filter(col("doc_id") === 2L).select("fluency6")
        .as[Option[Double]].collect().toSeq == Seq(Some(0.0)))
      // replay that actually RECOMPUTES: drop the marker fast-path AND
      // the out epoch (the crash state where only the reject half
      // landed) — the replay must re-run the enrichment, recommit an
      // identical out epoch, and skip the already-committed reject
      // epoch without duplicating it
      Files.delete(java.nio.file.Paths.get(s"$dir/out", "_graft_quality_epoch"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/out/epoch=0"))
      QualityGate.applyBatch(spark,
        Seq((1L, "the quick brown fox jumps"), (2L, "zyx qqq www eee"),
          (3L, "solo")).toDF("doc_id", "text"),
        batchId = 0, band, s"$dir/out", s"$dir/reject", enrich)
      assert(spark.read.parquet(s"$dir/out")
        .select("doc_id", "fluency6").as[(Long, Double)].collect().toMap
        == Map(1L -> 0.875), "recomputed epoch must be value-identical")
      assert(spark.read.parquet(s"$dir/reject").count() == 2,
        "replay must not duplicate the committed reject epoch")
    } finally q.stop()
  }
}
