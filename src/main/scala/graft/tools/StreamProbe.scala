package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: prints the bench line's streaming fragment on its own, so
  * sink/pipeline changes get a throughput read without the full bench.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("{" + graft.StreamBench.jsonFragment(spark) + "}")
    spark.stop()
  }
}
