package graft.tools

import org.apache.spark.sql.SparkSession

/** Local timing harness: run named SparkEntry queries with Bench's exact
  * session settings and print per-query wall time + row count — the
  * fast feedback loop for tuning one query without a full bench run.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName>...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
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
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    // GRAFT_TIME_COUNT=1 restores the legacy count() action; default is
    // the noop sink (matches Bench's round-15 timed action — count()
    // lets the optimizer prune the very work being timed, guide §1.4)
    val useCount = sys.env.get("GRAFT_TIME_COUNT").contains("1")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (useCount) {
        val n = df.count()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      } else {
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (noop)")
      }
    }
    spark.stop()
  }
}
