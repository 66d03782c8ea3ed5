package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Index-compaction contract: N appends accumulate N file-sets per
  * bucket; [[Bucketing.compactTable]] folds each bucket back to ONE
  * file while leaving the catalog entry, the bucket spec, the serve
  * results, and the exchange-free serve plans byte-identical. The
  * publish is a versioned-location pointer flip, so compaction is
  * SERVE-SAFE (readers planned before the flip keep their snapshot;
  * concurrent serves see pre- or post-compact rows, never an error)
  * and every crash window degrades to an orphan directory the next
  * run sweeps.
  */
class CompactTableSpec extends SparkSpec {

  private lazy val docs = graft.Tables.load(spark, sfSmoke, "documents")
  private lazy val emb = graft.Tables.load(spark, sfSmoke, "embeddings")

  /** Bucket-id → data-file count, parsed from the bucketed file names
    * (`part-…_00003.c000…` — the `_NNNNN` before `.c000` is the bucket).
    */
  private def filesPerBucket(table: String): Map[Int, Int] = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val pat = "_(\\d{5})\\.".r
    fs.listStatus(loc).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .flatMap(st => pat.findFirstMatchIn(st.getPath.getName).map(_.group(1).toInt))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("compact folds N appends to one file per bucket; probe rows and plans unchanged") {
    val batches = Seq("src1", "src2", "src3")
    DedupIndex.build(
      docs.filter(!col("source").isin("src0" +: batches: _*)),
      "compactspec_idx", "doc_id", "text")
    batches.foreach(b => DedupIndex.append(spark, "compactspec_idx",
      docs.filter(col("source") === b), "doc_id", "text"))

    assert(filesPerBucket("compactspec_idx").values.max > 1,
      "fixture must accumulate multiple file-sets per bucket before compaction")
    val probeBatch = docs.filter(col("source") === "src0")
    def probe() = DedupIndex.probe(spark, "compactspec_idx",
      probeBatch, "doc_id", "text")
    val before = probe().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(before.nonEmpty, "fixture must contain cross-source near-dups")

    DedupIndex.compact(spark, "compactspec_idx")

    Seq("compactspec_idx", "compactspec_idx_wh").foreach { t =>
      val perBucket = filesPerBucket(t)
      assert(perBucket.nonEmpty && perBucket.values.max == 1,
        s"$t not folded to one file per bucket: $perBucket")
    }
    val after = probe().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before, "compaction changed probe results")

    // the no-exchange serve property must survive: the index side of
    // the band join still reads its stored bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = probe().queryExecution.executedPlan
      val inner = exec match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bandJoins = inner.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("band_key")) => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.leftKeys.exists(_.toString.contains("band_key")) => j
      }
      assert(bandJoins.nonEmpty, s"expected a shuffled band join:\n$inner")
      bandJoins.flatMap(_.children)
        .filter(c => c.toString.contains("compactspec_idx"))
        .foreach { indexSide =>
          assert(!indexSide.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
            s"compaction broke the exchange-free index side:\n$indexSide")
        }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANN serving index: compact after appends preserves serve rows") {
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    AnnIndex.buildLsh(base, "compactspec_ann", planes = 6, dims = 64, buckets = 8)
    (1 to 3).foreach(i => AnnIndex.appendLsh(
      emb.filter(col("vec_id") % 4 === 0 && col("vec_id") % 3 === i % 3),
      "compactspec_ann", planes = 6, dims = 64))
    val probes = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
    def serve() = AnnIndex.lshServe(spark, "compactspec_ann", probes,
      k = 5, planes = 6, dims = 64)
    val before = serve().collect().map(_.toString).sorted

    assert(filesPerBucket("compactspec_ann").values.max > 1)
    AnnIndex.compact(spark, "compactspec_ann")
    val perBucket = filesPerBucket("compactspec_ann")
    assert(perBucket.nonEmpty && perBucket.values.max == 1,
      s"ANN index not folded: $perBucket")
    assert(serve().collect().map(_.toString).sorted.sameElements(before),
      "compaction changed ANN serve results")
  }

  test("serve-safe: a reader planned before the flip keeps its snapshot; " +
    "concurrent serves during compact never fail or see partial state") {
    val t = "compactspec_live"
    DedupIndex.build(docs.filter(col("source") =!= "src0"), t, "doc_id", "text")
    DedupIndex.append(spark, t,
      docs.filter(col("source") === "src0"), "doc_id", "text")
    val expected = spark.table(t).collect().map(_.toString).toSet

    // plan + execute a reader BEFORE the flip: its captured file
    // listing points at the pre-compact location, which the flip must
    // leave untouched (the in-place swap this replaces made exactly
    // this reader throw FileNotFound)
    val pre = spark.table(t)
    assert(pre.collect().map(_.toString).toSet == expected)

    // serve continuously while the compaction runs on another thread;
    // every result must be the full row set (pre ≡ post content),
    // and no query may error mid-flip
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val fut = Future(Bucketing.compactTable(spark, t))(ExecutionContext.global)
    var serves = 0
    while (!fut.isCompleted) {
      assert(spark.table(t).collect().map(_.toString).toSet == expected,
        s"concurrent serve $serves saw partial state")
      serves += 1
    }
    Await.result(fut, 2.minutes)

    // the pre-flip reader still collects its consistent snapshot…
    assert(pre.collect().map(_.toString).toSet == expected,
      "a reader planned before compact lost its snapshot")
    // …and fresh readers resolve the compacted layout
    assert(spark.table(t).collect().map(_.toString).toSet == expected)
    assert(filesPerBucket(t).values.max == 1)
  }

  test("crash orphans — an unflipped version dir and the stale previous " +
    "location — are swept by the next compact") {
    val t = "compactspec_sweep"
    DedupIndex.build(docs.filter(col("source") =!= "src0"), t, "doc_id", "text")
    DedupIndex.append(spark, t,
      docs.filter(col("source") === "src0"), "doc_id", "text")
    val rows = spark.table(t).count()
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
    val base = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())

    Bucketing.compactTable(spark, t)
    val v1 = new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
    assert(v1 != base, "compact must flip to a versioned location")
    assert(fs.exists(base),
      "the previous location must survive the flip (in-flight readers)")

    // crash window: version dir written, pointer never flipped
    val orphan = new org.apache.hadoop.fs.Path(
      base.getParent, base.getName + "__v99999999999999")
    fs.mkdirs(orphan)

    Bucketing.compactTable(spark, t)
    assert(!fs.exists(base), "stale previous location not swept")
    assert(!fs.exists(orphan), "unflipped version orphan not swept")
    assert(fs.exists(v1),
      "the immediately-previous version must survive one grace cycle")
    assert(spark.table(t).count() == rows, "sweep lost rows")
    assert(filesPerBucket(t).values.max == 1)
  }

  test("crash between the legacy swap's renames is recovered on the next compact") {
    DedupIndex.build(docs.filter(col("source") =!= "src0"),
      "compactspec_crash", "doc_id", "text")
    DedupIndex.append(spark, "compactspec_crash",
      docs.filter(col("source") === "src0"), "doc_id", "text")
    val rows = spark.table("compactspec_crash").count()

    // simulate the worst crash point: original stepped aside into ._old,
    // replacement never moved in — the table location is GONE
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("compactspec_crash"))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(
      loc.getParent, "." + loc.getName + "._old")
    assert(fs.rename(loc, old), "failed to stage the crash state")

    Bucketing.compactTable(spark, "compactspec_crash")
    assert(spark.table("compactspec_crash").count() == rows,
      "recovery sweep lost rows")
    assert(!fs.exists(old), "recovery left the ._old debris behind")
    assert(filesPerBucket("compactspec_crash").values.max == 1)
  }
}
