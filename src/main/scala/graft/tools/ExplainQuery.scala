package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of one or more SparkEntry queries
  * at the smoke SF — the `.explain` audit loop (check pushed filters,
  * broadcast choices, exchange counts) without writing a spec first.
  * `GRAFT_SF_DIR` overrides the data dir; `GRAFT_FORMATTED=1` switches
  * to explain("formatted").
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"========== $name ==========")
      if (sys.env.contains("GRAFT_FORMATTED")) df.explain("formatted")
      else println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
