package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: the composed curation-ladder probe with per-tier cost
  * attribution — run [[graft.StreamBench.ladderThroughput]] at each
  * prefix of the tier stack (2 = quality+signature … 8 = all eight)
  * and read the docs/s DELTAS as each tier's marginal cost at the
  * probe's trigger shape. Two draws per point; the second is the
  * comparable one (the first carries plan/codegen warmth).
  */
object LadderProfile {
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
    val tiers = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 3, 4, 5, 6, 7, 8))
    val names = Map(2 -> "quality+signature", 3 -> "+line", 4 -> "+semantic",
      5 -> "+selection", 6 -> "+mixture", 7 -> "+quota", 8 -> "+upsample")
    tiers.foreach { n =>
      (1 to 2).foreach { i =>
        val (med, mn, mx) = graft.StreamBench.ladderThroughput(spark, n)
        println(f"ladder_docs_per_s[tiers=$n%d ${names(n)}%s, run $i] = $med%.0f [$mn%.0f, $mx%.0f]")
      }
    }
    spark.stop()
  }
}
