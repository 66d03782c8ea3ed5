package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FormatsSpec extends SparkSpec {

  private lazy val events = graft.Tables.load(spark, sfSmoke, "events")

  test("CSV round trip preserves rows, schema and timestamps") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(events, dir)
    val back = Formats.readCsv(spark, dir, events.schema)
    assert(back.count() == events.count())
    assert(back.schema == events.schema)
    val a = events.orderBy("event_id").limit(5).collect()
    val b = back.orderBy("event_id").limit(5).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("JSON-lines round trip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-json").toString
    Formats.writeJsonLines(events, dir)
    val back = Formats.readJsonLines(spark, dir, events.schema)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0)
  }

  test("ORC round trip preserves rows and values; filters push down to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(events, dir)
    val back = Formats.readOrc(spark, dir, events.schema)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).count() == 0)
    // pushdown parity with parquet: predicate reaches the ORC scan
    val plan = back.filter(col("user_id") === 7L).select("event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"expected pushed filter in ORC scan:\n$plan")
  }

  test("corrupt CSV rows null out in PERMISSIVE mode instead of failing the read") {
    val dir = Files.createTempDirectory("graft-csv-bad").toString
    val f = new java.io.File(dir, "data.csv")
    val w = new java.io.FileWriter(f)
    w.write("id,name,score\n1,alice,2.5\nnot_a_number,bob,oops\n3,carol,1.0\n")
    w.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
    val back = Formats.readCsv(spark, dir, schema)
    assert(back.count() == 3) // bad row kept with nulls, read continues
    assert(back.filter(col("id").isNull).count() == 1)
  }
}
