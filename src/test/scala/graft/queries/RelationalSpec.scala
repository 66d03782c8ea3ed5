package graft.queries

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and every oracle key exists") {
    val qs = graft.SparkEntry.queries
    assert(qs.nonEmpty)
    graft.SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle for unknown query $k"))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sfSmoke)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.limit(1).collect() // plan executes
    }
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q1 pricing summary aggregates are decimal-exact and grouped correctly") {
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // sum of count_order must equal filtered row count
    val li = graft.Tables.load(spark, sfSmoke, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-01").cast("timestamp"))
    assert(rows.map(_.getAs[Long]("count_order")).sum == li.count())
  }

  test("w2 last-write-wins returns one row per user") {
    val df = graft.SparkEntry.queries("w2_last_write_wins")(spark, sfSmoke)
    val n = df.count()
    assert(n == df.select("user_id").distinct().count())
  }

  test("j1 code lookup falls back to source value on miss") {
    val df = graft.SparkEntry.queries("j1_code_lookup")(spark, sfSmoke)
    import org.apache.spark.sql.functions.col
    // nations >= 20 are filtered from the dim, so fallback values (numeric
    // strings) must appear
    assert(df.filter(col("nation_name").rlike("^[0-9]+$")).count() > 0)
  }
}
