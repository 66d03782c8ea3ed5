package graft.tools

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev-only: measure the epoch-log LIFETIME cost the round-13 verdict
  * flagged — a gate's seen root gains one dir per trigger forever, and
  * every refresh walks it (Spark's whole-root file listing before
  * partition pruning, plus the any-data/latest-epoch scans). Round 14
  * bounds it with [[graft.streaming.EpochCommit.compactRuns]] (the
  * Bentley-Saxe run fold) + marker fast-paths; this probe is the
  * "refresh driver time flat from 100 to 10,000 accumulated epochs"
  * evidence.
  *
  * Fixture per (N, compact) point: one real gate trigger freezes epoch
  * 0, whose dir is then FS-cloned to epochs 1..N−1 (identical tiny
  * content — the probe measures FS-metadata scaling, not data volume;
  * clones bypass the counters, which only shifts the rates the timed
  * triggers run under, not the choreography). One untimed trigger at N
  * absorbs the first whole-prefix refresh (and, when compacting, the
  * one-off backlog fold — reported separately), then three timed
  * steady-state triggers; the MEDIAN is the per-trigger driver cost at
  * that accumulated-epoch count.
  *
  * Read: compact=false should grow with N (the O(triggers) listing),
  * compact=true should stay flat — the root holds O(log N) run dirs.
  */
object EpochLogProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ns = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(100, 1000, 10000))
    for (n <- ns; compact <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"graft-epochlog-$n-$compact").toString
      val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
      def batch(k: Long) = spark.range(5)
        .select((col("id") + k * 100L).as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(2))).as("source"))
      def apply(k: Long): Double = {
        val t0 = System.nanoTime()
        graft.streaming.MixtureGate.applyBatch(store, s"EL$n$compact",
          batch(k), k, "doc_id", "source",
          s"$dir/seen", s"$dir/sample", s"$dir/admit",
          compactSeen = compact)
        (System.nanoTime() - t0) / 1e9
      }
      apply(0L)
      // clone epoch 0 into epochs 1..N−1 — the accumulated log
      // (parallel: 10k sequential dir copies are driver-FS-bound)
      val conf = spark.sessionState.newHadoopConf()
      val fs = new Path(s"$dir/seen").getFileSystem(conf)
      val src = new Path(s"$dir/seen/epoch=0")
      java.util.stream.IntStream.range(1, n).parallel().forEach { k =>
        FileUtil.copy(fs, src, fs, new Path(s"$dir/seen/epoch=$k"),
          false, conf); ()
      }
      val absorb = apply(n.toLong) // whole-prefix refresh + backlog fold
      val timed = Seq(apply(n + 1L), apply(n + 2L), apply(n + 3L)).sorted
      val dirs = fs.listStatus(new Path(s"$dir/seen"))
        .count(d => d.isDirectory && d.getPath.getName.startsWith("epoch="))
      println(f"epochs=$n%6d compact=$compact%-5s trigger_s=${timed(1)}%7.3f " +
        f"[${timed(0)}%.3f, ${timed(2)}%.3f] absorb_s=$absorb%7.3f seen_dirs=$dirs%d")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }
}
