package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run JUST the transformWithState dedup probe N times in one
  * session (the bench's 3×-in-one-JVM pattern), so tws-path questions —
  * like the r9→r8 level comparison — get an apples-to-apples read
  * without the full bench. Prints each run's events/s and state rows.
  */
object TwsProfile {
  def main(args: Array[String]): Unit = {
    // run in the bench-child context regardless of launcher
    // ([[SelfFork]] — keeps readings comparable to the shipped number)
    if (SelfFork.reexecIfWrapped("graft.tools.TwsProfile", args)) return
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val (eps, state) = graft.StreamBench.twsThroughput(spark)
      println(f"tws_events_per_s[$i] = $eps%.0f (state_rows=$state)")
    }
    spark.stop()
  }
}
