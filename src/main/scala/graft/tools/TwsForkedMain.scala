package graft.tools

import org.apache.spark.sql.SparkSession

/** Child-process entry for the bench's FORKED tws probe ([[graft.StreamBench.twsForked]]):
  * a fresh JVM + fresh session running exactly the standalone-envelope
  * protocol (one untimed warm-up run, three timed runs) and printing
  * ONE machine-parsable stdout line:
  *
  * {{{ TWSFORK <median> <min> <max> <state_rows> }}}
  *
  * Spark logs go to stderr (discarded by the parent), so stdout stays
  * clean for the parse. Exists because three same-day in-session runs
  * of identical code read 21,354 / 21,287 / 14,664 ev/s in round 12 —
  * the RocksDB path's number depends on the host JVM's GC/compaction
  * phase, which neither the load canary (batch-side) nor the warm-up
  * wave (JIT) can see; a fresh JVM per measurement removes the
  * session-phase variable entirely and makes the shipped number
  * directly comparable to the documented 18-26k standalone envelope.
  */
object TwsForkedMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.StreamBench.twsThroughput(spark) // untimed warm-up run
    val runs = IndexedSeq.fill(3)(graft.StreamBench.twsThroughput(spark))
      .sortBy(_._1)
    println(f"TWSFORK ${runs(1)._1}%.0f ${runs(0)._1}%.0f " +
      f"${runs(2)._1}%.0f ${runs(1)._2}%d")
    spark.stop()
  }
}
