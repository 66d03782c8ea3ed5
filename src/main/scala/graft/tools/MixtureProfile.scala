package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev-only: measure the [[graft.streaming.MixtureGate]] refresh cost —
  * the question round 12 left open: does the hash-band incremental
  * refresh scale with RATE DRIFT (plus the sample it must re-emit),
  * where the full re-decide scales with the CORPUS?
  *
  * Fixture: a pinned-size `tiny` source (n_min, so rates are
  * √(tiny/n_s)) and a `big` source grown across corpus points, with a
  * 256-byte per-row-varying payload — the refresh's real cost at
  * scale is corpus BYTES decoded, and a constant payload would
  * dictionary-encode to nothing in parquet, hiding the separation
  * behind fixed per-trigger overheads. At each corpus size:
  *
  *  - `inc`: +20k big docs, band refresh (the steady-state trigger —
  *    rates barely move, so no grown band at all: cost = re-read +
  *    re-write of the SAMPLE, ~√(tiny·big) rows, never the corpus);
  *  - `full`: the same trigger shape through the O(corpus) oracle
  *    path;
  *  - `inc big-drift` (once, last): tiny doubles, so n_min doubles
  *    and EVERY rate rises ×√2 — the worst grown-band case (reads
  *    √2−1 ≈ 41% of the sample's hash width from every source's
  *    band dirs).
  *
  * Protocol: modes ALTERNATE for three draws each (equalizes page-
  * cache state — a full draw evicts what its successor would have
  * reused) and the per-mode MIN is the comparable number; all draws
  * print. Read: inc should stay near-flat in corpus, full should
  * grow ~linearly, big-drift should track drift (the 41% band),
  * not corpus.
  */
object MixtureProfile {
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
    val tiny = 1000L
    Seq(4000000L, 16000000L).foreach { big =>
      val dir = Files.createTempDirectory(s"graft-mixprof-$big").toString
      val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
      def docs(src: String, from: Long, n: Long) =
        spark.range(from, from + n)
          .select(col("id").as("doc_id"), lit(src).as("source"),
            expr("repeat(md5(CAST(id AS STRING)), 8)").as("text"))
      def apply(batchId: Long, df: org.apache.spark.sql.DataFrame,
          incremental: Boolean, refreshEvery: Int = 1): Double = {
        val t0 = System.nanoTime()
        graft.streaming.MixtureGate.applyBatch(store, "MP", df, batchId,
          "doc_id", "source", s"$dir/seen", s"$dir/sample", s"$dir/admit",
          refreshEvery = refreshEvery, incremental = incremental)
        (System.nanoTime() - t0) / 1e9
      }
      def sampleRows(e: Long): Long =
        spark.read.parquet(s"$dir/sample/epoch=$e").count()
      // seed in 2M-doc batches (the freeze is a trigger-shaped
      // single-task write — a 16M-row monolith would time the seed,
      // not the refresh), cadenced so only the LAST seed batch emits
      // the sample + rates the measured refreshes start from
      val seedBatches = (big / 2000000L).toInt
      (0 until seedBatches).foreach { i =>
        val d = docs("big", 1000000000L + i * 2000000L, 2000000L)
        apply(i.toLong,
          if (i == 0) docs("tiny", 0L, tiny).unionByName(d) else d,
          incremental = true, refreshEvery = seedBatches)
      }
      val s = seedBatches.toLong
      val draws = (0 until 6).map { i =>
        val inc = i % 2 == 0
        val t = apply(s + i, docs("big", 2000000000L + i * 100000000L, 20000L),
          incremental = inc)
        (inc, t)
      }
      val tBigDrift = apply(s + 6, docs("tiny", 3000000000L, tiny),
        incremental = true)
      def fmt(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString("/")
      val (incDraws, fullDraws) =
        (draws.filter(_._1).map(_._2), draws.filterNot(_._1).map(_._2))
      println(f"corpus=$big%d tiny=$tiny%d: " +
        f"inc_min=${incDraws.min}%.2f s (draws ${fmt(incDraws)})  " +
        f"full_min=${fullDraws.min}%.2f s (draws ${fmt(fullDraws)})  " +
        f"inc_bigdrift=${tBigDrift}%.2f s  " +
        f"sample_rows=${sampleRows(s + 5)}/${sampleRows(s + 6)}")
    }
    spark.stop()
  }
}
