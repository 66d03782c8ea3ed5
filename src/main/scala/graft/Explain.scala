package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally time) of
  * one registered query: `runMain graft.Explain <query> [sfDir] [time]`.
  * `GRAFT_RAW=1` prints the raw executedPlan tree instead (the exact
  * string PlanShapeSpec pins match against).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.contains("GRAFT_RAW"))
      println(df.queryExecution.executedPlan.toString)
    else df.explain("formatted")
    if (args.length > 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"rows=$n elapsed=${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      val n2 = df.count()
      println(s"rows=$n2 elapsed2=${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
