package graft

/** The driver harness builds its own SparkSession; Tables.load must not
  * depend on the builder having set the nanos legacy flag.
  */
class TablesSpec extends SparkSpec {

  test("events loads even when the session lacks the nanos flag") {
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val ev = Tables.load(fresh, sfSmoke, "events")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }

  test("entry runs on a fresh session") {
    assert(SparkEntry.entry(spark.newSession()).count() > 0)
  }
}
