package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run just the streaming bench fragment (the full Bench
  * pays the 130-query batch pack first, which drowns iteration speed
  * when tuning the CDC trigger path).
  */
object StreamBenchMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("{" + graft.StreamBench.jsonFragment(spark) + "}")
    spark.stop()
  }
}
