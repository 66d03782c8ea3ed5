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
}
