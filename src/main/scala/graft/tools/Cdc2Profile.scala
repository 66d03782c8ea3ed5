package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for cdc2_schemaless (round 16): to_json synth,
  * from_json parse, map transforms, final sort — timed cumulatively so
  * the per-stage delta is visible.
  *
  * Usage: runMain graft.tools.Cdc2Profile <sfDir>
  */
object Cdc2Profile {
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
    graft.Tables.load(spark, sfDir, "events").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdc2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ev = graft.Tables.load(spark, sfDir, "events").repartition(col("event_id"))
    val image = struct(
      col("event_id").cast("string").as("event_id"),
      col("user_id").cast("string").as("user_id"),
      col("event_type").as("event_type"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .cast("string").as("value"),
      unix_millis(col("ts")).as("created_at"))
    val isDelete = col("event_type") === "error"
    val inner = struct(
      when(isDelete, "d").otherwise("u").as("op"),
      unix_millis(col("ts")).as("ts_ms"),
      struct(lit("ASIS_USER").as("schema"), lit("UNREGISTERED_TBL").as("table")).as("source"),
      when(isDelete, image).as("before"),
      when(!isDelete, image).as("after"))
    def envelopes = ev.select(
      when(col("event_id") % 2 === 0, to_json(struct(inner.as("payload"))))
        .otherwise(to_json(inner)).as("value"))
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("to_json synth only")(noop(envelopes))
      val parsed = graft.cdc.Envelope.parseSchemaless(envelopes)
      time("+ parseSchemaless (maps, image_ts)")(noop(parsed))
      time("full cdc2 query")(noop(
        graft.SparkEntry.queries("cdc2_schemaless")(spark, sfDir)))
      time("full cdc1 query")(noop(
        graft.SparkEntry.queries("cdc1_e2e_sync")(spark, sfDir)))
      // range-sort sampling A/B: the final orderBy's range exchange
      // SAMPLES its child, re-running the whole json pipeline once for
      // bounds and once for the real shuffle — materialize before the
      // sort and the sampling pass reads cached/shuffled rows instead
      val sel = parsed.select(
        element_at(col("image"), "EVENT_ID").cast("long").as("event_id"),
        element_at(col("image"), "USER_ID").cast("long").as("user_id"),
        col("operation"), col("source_table"),
        size(col("image")).as("n_fields"),
        size(col("image_ts")).as("n_temporal"),
        element_at(col("image"), "VALUE")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("double").as("value"),
        element_at(col("image_ts"), "CREATED_AT").as("created_at"))
      time("cdc2 with localCheckpoint before orderBy")(
        noop(sel.localCheckpoint(true).orderBy(col("event_id"))))
      time("cdc2 with repartition before orderBy")(
        noop(sel.repartition(col("event_id")).orderBy(col("event_id"))))
    }
    spark.stop()
  }
}
