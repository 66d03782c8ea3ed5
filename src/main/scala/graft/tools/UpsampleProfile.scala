package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev-only: time [[graft.streaming.UpsampleGate.applyBatch]] alone at
  * the ladder probe's trigger shape (500 docs, 4 sources, unbinding
  * budgets → factor clamps at 4), to attribute the ladder's tier-8
  * cost: gate vs composition.
  */
object UpsampleProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-upprof").toString
    val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
    val budgets = {
      import spark.implicits._
      Seq(("s0", 100000000L), ("s1", 100000000L),
        ("s2", 100000000L), ("s3", 100000000L)).toDF("source", "budget")
    }
    def batch(from: Long) = spark.range(from, from + 500)
      .select(col("id").as("doc_id"),
        expr("concat('s', pmod(id, 4))").as("source"),
        expr("CAST(10 + pmod(id, 20) AS BIGINT)").as("n_tokens"))
    // mode: default = incremental refresh every trigger; "norefresh"
    // = cadence skips every refresh (isolates freeze+delta+factors+
    // admit); "full" = full-refresh path every trigger
    val mode = args.headOption.getOrElse("inc")
    val (refreshEvery, incremental) = mode match {
      case "norefresh" => (1000, true)
      case "full" => (1, false)
      case _ => (1, true)
    }
    (0 until 10).foreach { k =>
      val t0 = System.nanoTime()
      if (mode == "mix")
        graft.streaming.MixtureGate.applyBatch(store, "UPM", batch(k * 1000L),
          k.toLong, "doc_id", "source",
          s"$dir/mseen", s"$dir/msample", s"$dir/madmit")
      else
        graft.streaming.UpsampleGate.applyBatch(store, "UP", batch(k * 1000L),
          k.toLong, "doc_id", "source", "n_tokens", budgets,
          s"$dir/seen", s"$dir/sample", s"$dir/admit",
          refreshEvery = refreshEvery, incremental = incremental)
      println(f"trigger $k [$mode]: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
