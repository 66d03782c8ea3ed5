package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run JUST the semantic ingest-gate probe (optionally
  * several times), so trigger-path changes get a vectors/s read in
  * ~30 s instead of the full bench. `GRAFT_TRIGGER_TIMING=1` adds
  * per-phase wall times from
  * [[graft.streaming.SemanticIngestGate.applyBatch]].
  */
object SemanticProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_JOB_TRACE"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val name = j.stageInfos.lastOption.map(_.name).getOrElse("?")
              .take(70)
            starts.put(j.jobId, (System.nanoTime(), name)); ()
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            // the listener bus can drop a JobStart under load — a null
            // here must not kill the listener (sibling tools' pattern)
            Option(starts.remove(j.jobId)).foreach { case (t0, name) =>
              System.err.println(
                f"[job ${j.jobId}%4d] ${(System.nanoTime() - t0) / 1e6}%6.0f ms  $name")
            }
        })
    (1 to runs).foreach { i =>
      println(f"semantic_docs_per_s[$i] = ${graft.StreamBench.semanticThroughput(spark)}%.0f")
    }
    spark.stop()
  }
}
