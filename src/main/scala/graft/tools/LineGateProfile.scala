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
    if (args.headOption.contains("scan")) {
      // the round-11 residual: the gate's per-trigger state-file SCAN is
      // O(state) bytes even though the shuffle is O(batch). This mode
      // decides whether a line-hash-bucketed state layout (file-level
      // pruning under the broadcast probe) is worth building: seed up
      // to 20M distinct lines and report docs/s alongside the total
      // parquet bytes read per probe run. If docs/s stays flat while
      // bytes grow 100x, the scan is NOT dominating trigger time and
      // the layout stays a documented next step.
      val bytesRead = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (e.taskMetrics != null)
              bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead); ()
          }
        })
      Seq(0L, 2000000L, 20000000L).foreach { seed =>
        (1 to 2).foreach { i =>
          bytesRead.set(0L)
          val t0 = System.nanoTime()
          val eps = graft.StreamBench.lineGateThroughput(spark, seed)
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"line_docs_per_s[state=$seed, run $i] = $eps%.0f " +
            f"(probe ${wall}%.1f s incl. seed+warmup, input ${bytesRead.get / 1e6}%.0f MB)")
        }
      }
    } else if (args.headOption.contains("narrow")) {
      // end-to-end text-vs-hash60 state layout comparison (the
      // LineStateLayout micro-measurement, through the real gate):
      // docs/s at 0 / 2M / 20M seeded lines in both modes, two draws
      // each (second is the comparable one)
      Seq(0L, 2000000L, 20000000L).foreach { seed =>
        Seq(false, true).foreach { narrow =>
          (1 to 2).foreach { i =>
            val eps = graft.StreamBench.lineGateThroughput(spark, seed, narrow)
            println(f"line_docs_per_s[state=$seed, narrow=$narrow, run $i] = $eps%.0f")
          }
        }
      }
    } else if (args.headOption.contains("state")) {
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
