package graft.streaming

import graft.SparkSpec

/** The conf-pin registry that keeps co-resident streaming gates from
  * clobbering each other's trigger-sized session pins: the original
  * value restores only when the LAST holder releases, and release
  * order doesn't matter (the exact failure of the save/restore pair it
  * replaced: first-stream-out restored the pre-pin value under the
  * still-running second stream).
  */
class ConfPinsSpec extends SparkSpec {

  private val key = "spark.sql.shuffle.partitions"

  test("lower pins: last holder out restores; early release keeps the pin") {
    val original = spark.conf.get(key)
    spark.conf.set(key, "64") // known pre-pin baseline above the pins
    val a = java.util.UUID.randomUUID()
    val b = java.util.UUID.randomUUID()
    try {
      ConfPins.acquire(spark, key, 8L, lower = true, a)
      assert(spark.conf.get(key) == "8")
      // B registers interest even though the value already satisfies it
      ConfPins.acquire(spark, key, 8L, lower = true, b)
      // A terminates first — the pin must survive for B
      ConfPins.release(spark, key, lower = true, a)
      assert(spark.conf.get(key) == "8",
        "first release must not clobber the surviving holder's pin")
      ConfPins.release(spark, key, lower = true, b)
      assert(spark.conf.get(key) == "64", "last release restores")
    } finally spark.conf.set(key, original)
  }

  test("mixed desires combine (min for lower pins) and re-tighten on release") {
    val original = spark.conf.get(key)
    spark.conf.set(key, "64")
    val a = java.util.UUID.randomUUID()
    val b = java.util.UUID.randomUUID()
    try {
      ConfPins.acquire(spark, key, 8L, lower = true, a)
      ConfPins.acquire(spark, key, 4L, lower = true, b)
      assert(spark.conf.get(key) == "4", "min of live holders wins")
      ConfPins.release(spark, key, lower = true, b)
      assert(spark.conf.get(key) == "8", "release recomputes the combine")
      // a pin ABOVE the original never raises a lower-pin conf
      val c = java.util.UUID.randomUUID()
      ConfPins.acquire(spark, key, 10000L, lower = true, c)
      assert(spark.conf.get(key) == "8")
      ConfPins.release(spark, key, lower = true, c)
      ConfPins.release(spark, key, lower = true, a)
      assert(spark.conf.get(key) == "64")
    } finally spark.conf.set(key, original)
  }

  test("raise pins: max-combine, and the gate helper releases both keys") {
    val listKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val origList = spark.conf.get(listKey)
    val origShuffle = spark.conf.get(key)
    spark.conf.set(key, "64")
    try {
      val rel1 = ConfPins.acquireGatePins(spark, Some(8),
        java.util.UUID.randomUUID())
      val rel2 = ConfPins.acquireGatePins(spark, Some(8),
        java.util.UUID.randomUUID())
      assert(spark.conf.get(key) == "8")
      assert(spark.conf.get(listKey) == "1024")
      rel1()
      assert(spark.conf.get(key) == "8" && spark.conf.get(listKey) == "1024",
        "one gate stopping must not unpin the other")
      rel2()
      assert(spark.conf.get(key) == "64")
      assert(spark.conf.get(listKey) == origList)
    } finally {
      spark.conf.set(key, origShuffle)
      spark.conf.set(listKey, origList)
    }
  }
}
