package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run JUST the line-dedup gate probe (optionally several
  * times), so tier-0 trigger-path changes get a docs/s read in ~30 s
  * instead of the full bench — the sibling of [[SemanticProfile]].
  */
object LineGateProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def runs = args.headOption.filterNot(_ == "state").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("state")) {
      // gate-state scaling: docs/s at 0 / 200k / 2M pre-seeded distinct
      // lines (a 10× growth step). With the batch-pruned threshold read
      // the three numbers must sit inside one noise band; the unpruned
      // plan degrades ~linearly in the seed (it re-aggregated the FULL
      // state every trigger). Two draws per point — the second is the
      // comparable one (first carries plan/codegen warmth).
      Seq(0L, 200000L, 2000000L).foreach { seed =>
        (1 to 2).foreach { i =>
          val eps = graft.StreamBench.lineGateThroughput(spark, seed)
          println(f"line_docs_per_s[state=$seed, run $i] = $eps%.0f")
        }
      }
    } else (1 to runs).foreach { i =>
      println(f"line_docs_per_s[$i] = ${graft.StreamBench.lineGateThroughput(spark)}%.0f")
    }
    spark.stop()
  }
}
