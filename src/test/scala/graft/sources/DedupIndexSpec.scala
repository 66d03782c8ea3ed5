package graft.sources

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Incremental dedup contract: probing the persisted index returns
  * exactly the cross-side pairs the inline operator finds, and the
  * index side of the band join reads its stored bucketing — no
  * exchange under that subtree even when nothing broadcasts.
  */
class DedupIndexSpec extends SparkSpec {

  private lazy val docs = graft.Tables.load(spark, sfSmoke, "documents")

  test("probe over the stored index equals inline cross-side near-dup pairs") {
    DedupIndex.build(docs.filter(col("source") =!= "src0"), "dedupspec_idx",
      "doc_id", "text")
    val probed = DedupIndex.probe(spark, "dedupspec_idx",
        docs.filter(col("source") === "src0"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // inline reference: all-pairs near-dups, kept only where exactly one
    // side is src0, normalized to (indexed id, batch id)
    val srcOf = docs.select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Dedup.minHashNearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (srcOf(a) == "src0", srcOf(b) == "src0") match {
          case (false, true) => Some((a, b, j))
          case (true, false) => Some((b, a, j))
          case _ => None
        }
      }.toSet
    assert(probed == expected,
      s"probe/inline mismatch: ${probed.size} vs ${expected.size} pairs")
    assert(probed.nonEmpty, "fixture must contain cross-source near-dups")
  }

  test("append-then-probe is row-identical to rebuild-then-probe") {
    // build on src2+: src1 arrives later as an ingest batch
    DedupIndex.build(
      docs.filter(col("source") =!= "src0" && col("source") =!= "src1"),
      "dedupspec_app", "doc_id", "text")
    DedupIndex.append(spark, "dedupspec_app",
      docs.filter(col("source") === "src1"), "doc_id", "text")
    val appended = DedupIndex.probe(spark, "dedupspec_app",
        docs.filter(col("source") === "src0"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    DedupIndex.build(docs.filter(col("source") =!= "src0"),
      "dedupspec_reb", "doc_id", "text")
    val rebuilt = DedupIndex.probe(spark, "dedupspec_reb",
        docs.filter(col("source") === "src0"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(appended == rebuilt,
      s"append drifted from rebuild: ${appended.size} vs ${rebuilt.size} pairs")
    assert(appended.nonEmpty, "fixture must contain cross-source near-dups")
    // the append must have contributed exactly the batch's band rows
    assert(spark.table("dedupspec_app").count() ==
      spark.table("dedupspec_reb").count(),
      "appended index must cover exactly the same corpus as the rebuild")
  }

  test("the index side of the band join reads stored buckets: no exchange") {
    DedupIndex.build(docs.filter(col("source") =!= "src0"), "dedupspec_idx2",
      "doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = DedupIndex.probe(spark, "dedupspec_idx2",
        docs.filter(col("source") === "src0"), "doc_id", "text")
      val exec = probed.queryExecution.executedPlan
      val inner = exec match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the BAND join's index-side subtree must carry no shuffle: the
      // stored bucketing IS its partitioning (verification joins above
      // it repartition by id — that's their own key, not a regression)
      val bandJoins = inner.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.leftKeys.exists(_.toString.contains("band_key")) => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.leftKeys.exists(_.toString.contains("band_key")) => j
      }
      assert(bandJoins.nonEmpty, s"expected a shuffled band join:\n$inner")
      val indexSides = bandJoins.flatMap(_.children).filter(c =>
        c.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
          .exists(_.toString.contains("dedupspec_idx2")))
      assert(indexSides.nonEmpty, s"no band-join child scans the index table:\n$inner")
      indexSides.foreach { side =>
        val shuffles = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        assert(shuffles.isEmpty,
          s"index side must read its stored bucketing, found exchange:\n$side")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
