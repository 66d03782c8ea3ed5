package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** The epoch-log lifetime bound (round 14): [[EpochCommit.compactRuns]]
  * folds a gate's seen root into O(log triggers) runs without changing
  * ANY emitted epoch, survives a crash at every point of its two-phase
  * swap, and never lets a replayed batch re-freeze a folded epoch. Plus
  * the marker fast-paths' fallback contract and `retainSamples`.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "source")

  private def bag(dir: String, e: Long): Seq[Long] =
    spark.read.parquet(s"$dir/epoch=$e").select("doc_id").as[Long]
      .collect().toSeq.sorted

  private def epochDirs(root: String): Seq[String] = {
    val (fs, p) = EpochCommit.fsFor(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("epoch=")).sorted
  }

  // 8 batches whose rates move both ways (new sources arrive, old ones
  // catch up), so the refresh exercises keep + gained + new across the
  // fold boundary
  private def batchAt(k: Int): DataFrame = {
    val src = Seq("a", "b", "c")(k % 3)
    docs((0 until 4).map(i => ((k * 100 + i).toLong, src)) :+
      ((k * 100 + 50).toLong, "a"): _*)
  }

  test("compaction changes no emitted epoch and bounds the seen root's dir count") {
    val dirC = Files.createTempDirectory("graft-cmp-on").toString
    val dirN = Files.createTempDirectory("graft-cmp-off").toString
    val store = new SnapshotStore(spark, s"$dirC/store")
    (0 until 8).foreach { k =>
      MixtureGate.applyBatch(store, "CC", batchAt(k), k.toLong, "doc_id",
        "source", s"$dirC/seen", s"$dirC/sample", s"$dirC/admit",
        compactSeen = true)
      MixtureGate.applyBatch(store, "CN", batchAt(k), k.toLong, "doc_id",
        "source", s"$dirN/seen", s"$dirN/sample", s"$dirN/admit",
        compactSeen = false)
      // every emitted surface identical across the fold boundary
      assert(bag(s"$dirC/sample", k) == bag(s"$dirN/sample", k),
        s"sample epoch $k diverged under compaction")
      assert(bag(s"$dirC/admit", k) == bag(s"$dirN/admit", k),
        s"admit epoch $k diverged under compaction")
    }
    val (cDirs, nDirs) = (epochDirs(s"$dirC/seen"), epochDirs(s"$dirN/seen"))
    assert(nDirs.size == 8, s"uncompacted root should hold 8 dirs: $nDirs")
    assert(cDirs.size < nDirs.size,
      s"compacted root must hold fewer run dirs: $cDirs")
    // the folded layout keeps the band dirs — directory pruning intact
    val (fs, _) = EpochCommit.fsFor(spark, s"$dirC/seen")
    val oldestRun = new Path(s"$dirC/seen/${cDirs.head}")
    assert(fs.listStatus(oldestRun).exists(d =>
      d.isDirectory && d.getPath.getName.startsWith("__band=")),
      "folded runs must stay hash-band partitioned")
  }

  test("a replayed batch whose epoch dir was folded does not re-freeze (no silent duplication)") {
    val dir = Files.createTempDirectory("graft-cmp-replay").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def apply(k: Long) = MixtureGate.applyBatch(store, "CR", batchAt(k.toInt),
      k, "doc_id", "source", s"$dir/seen", s"$dir/sample", s"$dir/admit")
    (0L until 6L).foreach(apply)
    val before = epochDirs(s"$dir/seen")
    assert(!before.contains("epoch=0"), s"fixture needs epoch 0 folded: $before")
    val rows = spark.read.parquet(s"$dir/seen").count()
    apply(0L) // replay of a folded batch
    apply(2L)
    assert(epochDirs(s"$dir/seen") == before,
      "replaying a folded batch must not re-create its epoch dir")
    assert(spark.read.parquet(s"$dir/seen").count() == rows,
      "replaying a folded batch must not duplicate seen rows")
  }

  test("a merge swap crashed between commit and visible swap is finished by recovery") {
    val dir = Files.createTempDirectory("graft-cmp-crash").toString
    val root = s"$dir/seen"
    // three banded epochs committed the way the gates freeze them
    (0 to 2).foreach { k =>
      EpochCommit.commitEpoch(
        batchAt(k).withColumn("__h6",
          RateGate.h6Expr("mix3", "doc_id"))
          .withColumn("__band", org.apache.spark.sql.functions.expr(
            s"CAST(__h6 DIV ${RateGate.BandWidth} AS INT)")),
        root, k.toLong, partitionBy = Seq("__band"))
    }
    val total = spark.read.parquet(root).count()
    // drive a real merge, then reconstruct the mid-swap crash state:
    // hidden committed dir present, one source already deleted, the
    // other still visible
    assert(EpochCommit.compactRuns(spark, root, 2L) >= 1)
    val afterDirs = epochDirs(root)
    val (fs, rootP) = EpochCommit.fsFor(spark, root)
    val hi = afterDirs.last.stripPrefix("epoch=").toLong
    // simulate: the merged run was committed hidden but the swap died
    // after deleting ONE source — recovery must finish the deletes and
    // take the visible name
    val mergedHidden = new Path(rootP, s".merged_e$hi")
    assert(fs.rename(new Path(rootP, s"epoch=$hi"), mergedHidden))
    EpochCommit.recoverRuns(spark, root)
    assert(epochDirs(root) == afterDirs, "recovery must restore the visible run")
    assert(spark.read.parquet(root).count() == total,
      "recovery must preserve every row")
    // and a reader that forgot recovery would have seen the hidden dir
    // ignored (dot-prefixed) — the data only reappears via recoverRuns
  }

  test("retainSamples keeps only the newest N sample epochs; refresh survives the pruning") {
    val dir = Files.createTempDirectory("graft-cmp-retain").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    (0L until 5L).foreach { k =>
      MixtureGate.applyBatch(store, "RT", batchAt(k.toInt), k, "doc_id",
        "source", s"$dir/seen", s"$dir/sample", s"$dir/admit",
        retainSamples = 2)
    }
    assert(epochDirs(s"$dir/sample") == Seq("epoch=3", "epoch=4"))
    // the retained latest is a valid refresh base for the next trigger
    MixtureGate.applyBatch(store, "RT", batchAt(5), 5L, "doc_id", "source",
      s"$dir/seen", s"$dir/sample", s"$dir/admit", retainSamples = 2)
    assert(epochDirs(s"$dir/sample") == Seq("epoch=4", "epoch=5"))
  }

  test("marker fast-paths fall back to the listing when the marker is lost or stale") {
    val dir = Files.createTempDirectory("graft-cmp-marker").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def apply(k: Long) = MixtureGate.applyBatch(store, "MK", batchAt(k.toInt),
      k, "doc_id", "source", s"$dir/seen", s"$dir/sample", s"$dir/admit")
    (0L until 3L).foreach(apply)
    val (fs, _) = EpochCommit.fsFor(spark, s"$dir/sample")
    // lost latest marker → listing fallback, same answer
    assert(EpochCommit.latestEpochBeforeFast(
      spark, s"$dir/sample", 3L, "_graft_latest").contains(2L))
    fs.delete(new Path(s"$dir/sample/_graft_latest"), false)
    assert(EpochCommit.latestEpochBeforeFast(
      spark, s"$dir/sample", 3L, "_graft_latest").contains(2L))
    // stale-but-valid marker → the older committed base is accepted
    // (refresh algebra is base-independent) — and the next refresh
    // repairs the marker and commits the correct epoch anyway
    EpochCommit.writeMarker(spark, s"$dir/sample/_graft_latest", 1L)
    assert(EpochCommit.latestEpochBeforeFast(
      spark, s"$dir/sample", 3L, "_graft_latest").contains(1L))
    apply(3L)
    assert(EpochCommit.readMarker(spark, s"$dir/sample/_graft_latest")
      .contains(3L))
    // sample 3 must equal the from-scratch decision despite the stale base
    val dir2 = Files.createTempDirectory("graft-cmp-marker2").toString
    val store2 = new SnapshotStore(spark, s"$dir2/store")
    (0L until 4L).foreach { k =>
      MixtureGate.applyBatch(store2, "MK2", batchAt(k.toInt), k, "doc_id",
        "source", s"$dir2/seen", s"$dir2/sample", s"$dir2/admit")
    }
    assert(bag(s"$dir/sample", 3L) == bag(s"$dir2/sample", 3L),
      "a stale marker base must not change the emitted sample")
    // lost any-data marker → recursive walk fallback
    fs.delete(new Path(s"$dir/seen/_graft_any_data"), false)
    assert(EpochCommit.anyEpochDataFast(spark, s"$dir/seen", "_graft_any_data"))
  }

  test("crash-stale latest marker + compaction at refreshEvery=2: replay repairs the marker, no duplicated sample rows") {
    // The round-14 ADVICE scenario: a crash between the sample
    // commitEpoch and the marker write leaves _graft_latest stale; the
    // replay skips the refresh body (epoch exists), then step 7 folds
    // runs PAST the stale marker — and the next refresh (refreshEvery
    // ≥ 2), resolving its base from the stale marker, would re-decide
    // the straddling folded run's docs as new, duplicating rows already
    // kept from the previous sample. The fix: the replay path advances
    // the marker whenever the sample epoch exists, BEFORE step 7 clamps
    // its fold boundary to the marker.
    // Fixture geometry (refreshEvery = 4, refreshes at k = 3, 7, 11):
    // after trigger 7 the seen runs are {[0-2], 3, 4, 5, 6, 7}; a replay
    // of 7 folds ≤ 6, and the Bentley-Saxe pass merges [0-2],3,4,5,6
    // into ONE run [0-6] — which straddles a marker stale at 3. The
    // refresh at 11 would then split at e0 = 3, drop [0-6] from
    // keep/gained, and re-decide ALL its rows (0-3 included) as new.
    val dirX = Files.createTempDirectory("graft-cmp-stale").toString
    val dirR = Files.createTempDirectory("graft-cmp-staleref").toString
    val store = new SnapshotStore(spark, s"$dirX/store")
    def applyX(k: Long) = MixtureGate.applyBatch(store, "SX", batchAt(k.toInt),
      k, "doc_id", "source", s"$dirX/seen", s"$dirX/sample", s"$dirX/admit",
      refreshEvery = 4)
    def applyR(k: Long) = MixtureGate.applyBatch(store, "SR", batchAt(k.toInt),
      k, "doc_id", "source", s"$dirR/seen", s"$dirR/sample", s"$dirR/admit",
      refreshEvery = 4)
    (0L to 7L).foreach { k => applyX(k); applyR(k) }
    // simulate the crash: sample epoch 7 committed, marker still at the
    // previous refresh (3) — then the foreachBatch replays trigger 7
    EpochCommit.writeMarker(spark, s"$dirX/sample/_graft_latest", 3L)
    applyX(7L)
    assert(EpochCommit.readMarker(spark, s"$dirX/sample/_graft_latest")
      .contains(7L), "the replay-skip path must repair the stale marker")
    (8L to 11L).foreach { k => applyX(k); applyR(k) }
    // multiset-compare every emitted sample — a straddling fold would
    // duplicate kept rows in epoch 11 and every refresh after
    Seq(3L, 7L, 11L).foreach { e =>
      assert(bag(s"$dirX/sample", e) == bag(s"$dirR/sample", e),
        s"sample epoch $e diverged after the crash-stale-marker replay")
    }
  }

  test("compactEvery defers folds without changing any emitted epoch") {
    val dirD = Files.createTempDirectory("graft-cmp-defer").toString
    val dirI = Files.createTempDirectory("graft-cmp-inline").toString
    val store = new SnapshotStore(spark, s"$dirD/store")
    (0 until 8).foreach { k =>
      MixtureGate.applyBatch(store, "CD", batchAt(k), k.toLong, "doc_id",
        "source", s"$dirD/seen", s"$dirD/sample", s"$dirD/admit",
        compactEvery = 4)
      MixtureGate.applyBatch(store, "CI", batchAt(k), k.toLong, "doc_id",
        "source", s"$dirI/seen", s"$dirI/sample", s"$dirI/admit")
      assert(bag(s"$dirD/sample", k) == bag(s"$dirI/sample", k),
        s"sample epoch $k diverged under deferred compaction")
      assert(bag(s"$dirD/admit", k) == bag(s"$dirI/admit", k),
        s"admit epoch $k diverged under deferred compaction")
      // between cadence points the deferred root accumulates plain
      // trigger epochs (no fold ran yet)
      if (k == 2)
        assert(epochDirs(s"$dirD/seen").size == 3,
          "no fold may run before the compactEvery cadence point")
    }
    // the cadence point still bounds the root
    assert(epochDirs(s"$dirD/seen").size < 8,
      s"deferred compaction must still fold: ${epochDirs(s"$dirD/seen")}")
  }

  test("an admit frame retained across triggers fails loudly once its seen epoch folds") {
    val dir = Files.createTempDirectory("graft-cmp-retained").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def apply(k: Long) = MixtureGate.applyBatch(store, "RF", batchAt(k.toInt),
      k, "doc_id", "source", s"$dir/seen", s"$dir/sample", s"$dir/admit")
    apply(0L)
    val retained = apply(1L).get // plan reads seen/epoch=1
    retained.count() // valid within the producing trigger
    apply(2L) // step 7 folds epochs 0-1 into run epoch=1 (files replaced)
    // the single-trigger-validity contract: evaluation now fails loudly
    // (the frame's listed files were deleted by the fold) instead of
    // silently returning stale or partial rows
    val e = intercept[Throwable] { retained.count() }
    def messages(t: Throwable, acc: List[String] = Nil): List[String] =
      if (t == null || acc.size > 8) acc
      else messages(t.getCause, acc :+ (s"${t.getClass.getName}: ${t.getMessage}"))
    val all = messages(e).mkString("\n")
    assert(all.contains("FileNotFound") || all.contains("does not exist") ||
      all.contains("FILE_NOT_EXIST"),
      s"expected a missing-file failure, got:\n$all")
  }

  test("a crashed fold is recovered even when the trigger runs with compactSeen=false") {
    // the recoverRuns twin of the frozenCovered rule: turning
    // compaction off on a root where a fold crashed mid-swap must not
    // leave reads on the half-swapped root (hidden merged dir ignored
    // by Spark, source runs partially deleted) — recovery is one cheap
    // listing and runs regardless of this call's compactSeen
    val dir = Files.createTempDirectory("graft-cmp-off").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def apply(k: Long, compact: Boolean) = MixtureGate.applyBatch(store,
      "CO", batchAt(k.toInt), k, "doc_id", "source", s"$dir/seen",
      s"$dir/sample", s"$dir/admit", refreshEvery = 4, compactSeen = compact)
    (0L to 3L).foreach(k => apply(k, compact = true))
    val total = spark.read.parquet(s"$dir/seen").count()
    // reconstruct the mid-swap crash (the folded run hidden again, as
    // if the swap died before its visible rename)
    val (fs, rootP) = EpochCommit.fsFor(spark, s"$dir/seen")
    val hi = epochDirs(s"$dir/seen").last.stripPrefix("epoch=").toLong
    assert(fs.rename(new Path(rootP, s"epoch=$hi"),
      new Path(rootP, s".merged_e$hi")))
    assert(spark.read.parquet(s"$dir/seen").count() < total,
      "fixture must actually hide rows from a recovery-less reader")
    // next trigger arrives with compaction turned OFF — recovery must
    // still run (structural pin: the hidden dir is re-swapped and every
    // frozen row is visible again; only recoverRuns can do that on a
    // compactSeen=false path) and the refresh at k=7 sees every doc
    (4L to 7L).foreach(k => apply(k, compact = false))
    assert(!fs.listStatus(rootP).exists(_.getPath.getName.startsWith(".merged_")),
      "the crashed fold must be re-driven on the compactSeen=false path")
    assert(spark.read.parquet(s"$dir/seen").count() >= total,
      "every pre-crash frozen row must be visible again")
    val sampleDocs = bag(s"$dir/sample", 7L)
    val refDir = Files.createTempDirectory("graft-cmp-offref").toString
    val refStore = new SnapshotStore(spark, s"$refDir/store")
    (0L to 7L).foreach(k => MixtureGate.applyBatch(refStore, "CR",
      batchAt(k.toInt), k, "doc_id", "source", s"$refDir/seen",
      s"$refDir/sample", s"$refDir/admit", refreshEvery = 4,
      compactSeen = false))
    assert(sampleDocs == bag(s"$refDir/sample", 7L),
      "recovery must run before reads even with compactSeen=false")
  }

  test("a pre-band legacy seen root fails loudly with restart instructions") {
    val dir = Files.createTempDirectory("graft-cmp-legacy").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    // epoch 0 written UN-banded (the pre-band layout)
    EpochCommit.commitEpoch(batchAt(0), s"$dir/seen", 0L)
    val e = intercept[IllegalStateException] {
      MixtureGate.applyBatch(store, "LG", batchAt(1), 1L, "doc_id",
        "source", s"$dir/seen", s"$dir/sample", s"$dir/admit")
    }
    assert(e.getMessage.contains("restart this gate on a fresh root"))
  }
}
