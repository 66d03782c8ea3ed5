package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: the round-13 verdict's warmth A/B. Builder-to-builder,
  * r13's concurrent/multiplexed medians dropped −26%/−21% in the same
  * round that moved the tws probe into a forked JVM — r12's numbers
  * rode FOUR full in-session tws waves of C2/JIT warmth that r13's
  * fragment no longer has. Two modes, run in SEPARATE JVMs same-day:
  *
  *  - `cold`: the r13 bench context — concurrent + multiplexed with
  *    only their own untimed warm-up run (minMedMax protocol);
  *  - `warm`: the r12 context — four full in-session tws waves first,
  *    then the identical protocol.
  *
  * If warm ≈ r12's envelope and cold ≈ r13's readings, the drop is
  * measurement context (lost cross-probe warmth), not gate code.
  */
object WarmthAB {
  def main(args: Array[String]): Unit = {
    // run in the bench-child context regardless of launcher
    // ([[SelfFork]] — keeps readings comparable to the shipped number)
    if (SelfFork.reexecIfWrapped("graft.tools.WarmthAB", args)) return
    val mode = args.headOption.getOrElse("cold")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "warm")
      (1 to 4).foreach(_ => graft.StreamBench.twsThroughput(spark))
    def minMedMax(run: () => Double): (Double, Double, Double) = {
      run() // untimed warm-up, the bench protocol
      val xs = IndexedSeq(run(), run(), run()).sorted
      (xs(0), xs(1), xs(2))
    }
    val (cMin, cMed, cMax) =
      minMedMax(() => graft.StreamBench.concurrentThroughput(spark))
    val (mMin, mMed, mMax) =
      minMedMax(() => graft.StreamBench.multiplexedThroughput(spark))
    println(f"WARMTHAB mode=$mode%s concurrent=$cMed%.0f [$cMin%.0f, $cMax%.0f] " +
      f"multiplexed=$mMed%.0f [$mMin%.0f, $mMax%.0f]")
    spark.stop()
  }
}
