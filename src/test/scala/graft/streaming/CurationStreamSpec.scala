package graft.streaming

import graft.SparkSpec
import graft.sources.{AnnIndex, DedupIndex}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The composed streaming curation ladder: quality constraints, the
  * signature dedup gate, and (optionally) the semantic gate run as ONE
  * stream, every tier exactly-once, tier k+1 reading tier k's frozen
  * epoch. The contract under test: the curated output equals what the
  * tiers produce run independently in trigger order, each reject lands
  * in its tier's directory exactly once, and a crash between tiers
  * replays to the identical state.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(s: String) = s * 6 // ~18 words: non-degenerate shingles

  private val constraints = Seq(
    ("EMPTY_TEXT", length(trim(col("text"))) === 0),
    ("TOO_SHORT", length(col("text")) < 40))

  test("three-tier trigger flow: each reject lands in its tier, survivors reach curated and the index") {
    val dir = Files.createTempDirectory("graft-curation").toString
    val corpus = Seq((1L, doc("the quick brown fox "))).toDF("doc_id", "text")
    DedupIndex.build(corpus, "curation_idx", "doc_id", "text")
    val baseRows = spark.table("curation_idx").count()

    val mem = MemoryStream[(Long, String)](spark)
    val q = CurationStream.start(mem.toDF().toDF("doc_id", "text"),
      constraints, "curation_idx", "doc_id", "text",
      root = s"$dir/cur", checkpoint = s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      // trigger 1: 10 quality-rejected (short), 11 dup of the corpus,
      // 12 new (survives all tiers)
      mem.addData(
        (10L, "too short"),
        (11L, doc("the quick brown fox ")),
        (12L, doc("sphinx of black quartz judge ")))
      q.processAllAvailable()
      // trigger 2: 20 = near-dup of trigger-1 SURVIVOR 12 (cross-trigger
      // block through the grown index), 21 quality-rejected, 22 new
      mem.addData(
        (20L, doc("sphinx of black quartz judge ")),
        (21L, ""),
        (22L, doc("how vexingly daft zebras jump ")))
      q.processAllAvailable()

      val curated = spark.read.parquet(s"$dir/cur/curated")
        .select("doc_id").as[Long].collect().toSet
      assert(curated == Set(12L, 22L), s"curated drifted: $curated")

      val qRejects = spark.read.parquet(s"$dir/cur/quality_reject")
        .select("doc_id", "violated").as[(Long, String)].collect().toSet
      assert(qRejects == Set((10L, "TOO_SHORT"), (21L, "EMPTY_TEXT")))

      val dRejects = spark.read.parquet(s"$dir/cur/dup_reject")
        .select("doc_id", "dup_of", "reason").as[(Long, Long, String)]
        .collect().toSet
      assert(dRejects == Set(
        (11L, 1L, "DUP_OF_CORPUS"), (20L, 12L, "DUP_OF_CORPUS")))

      // the index grew by exactly the curated docs' band rows
      spark.catalog.refreshTable("curation_idx")
      assert(spark.table("curation_idx").count() - baseRows == 2 * 8,
        "index must grow by ladder survivors only")
    } finally q.stop()
  }

  test("crash between tiers replays the ladder to the identical state") {
    val dir = Files.createTempDirectory("graft-curation-crash").toString
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationcrash_idx", "doc_id", "text")
    val batch = Seq(
      (30L, "short"),
      (31L, doc("pack my box with jugs ")),
      (32L, doc("pack my box with jugs "))).toDF("doc_id", "text")

    // crash after tier 1: only the quality gate committed its epoch
    QualityGate.applyBatch(spark, batch, 0L, constraints,
      s"$dir/cur/quality_pass", s"$dir/cur/quality_reject")
    // the replay runs the WHOLE ladder: tier 1 skips on its marker,
    // tiers 2-3 compute from the frozen quality_pass epoch
    CurationStream.applyBatch(spark, batch, 0L, constraints,
      "curationcrash_idx", "doc_id", "text", s"$dir/cur")
    // …and a full second replay is a no-op everywhere
    CurationStream.applyBatch(spark, batch, 0L, constraints,
      "curationcrash_idx", "doc_id", "text", s"$dir/cur")

    val curated = spark.read.parquet(s"$dir/cur/curated")
      .select("doc_id").as[Long].collect().toSeq
    assert(curated == Seq(31L), s"replayed ladder drifted: $curated")
    assert(spark.read.parquet(s"$dir/cur/quality_reject").count() == 1)
    val dup = spark.read.parquet(s"$dir/cur/dup_reject")
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(dup == Set((32L, 31L)), "in-batch dup must reject exactly once")
  }

  test("line-dedup tier 0: boilerplate strips BEFORE the quality gate judges") {
    val dir = Files.createTempDirectory("graft-curation-line").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationline_idx", "doc_id", "text")
    val banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    // 50/51 share the banner line; 50's REMAINING text is long enough
    // to pass quality, 51's residue is too short — the quality verdict
    // must be about the CLEANED text, which is why tier 0 runs first
    val batch = Seq(
      (50L, s"$banner\n${doc("pack my box with jugs ")}"),
      (51L, s"$banner\nhello")).toDF("doc_id", "text")
    CurationStream.applyBatch(spark, batch, 0L, constraints,
      "curationline_idx", "doc_id", "text", s"$dir/cur",
      lineDedup = Some(CurationStream.LineDedupTier(store, "CL")))
    // replay the whole ladder: every tier must no-op
    CurationStream.applyBatch(spark, batch, 0L, constraints,
      "curationline_idx", "doc_id", "text", s"$dir/cur",
      lineDedup = Some(CurationStream.LineDedupTier(store, "CL")))

    val cleaned = spark.read.parquet(s"$dir/cur/line_clean")
      .select("doc_id", "text", "n_dropped")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, nd) => id -> ((t, nd)) }.toMap
    assert(cleaned(50L)._2 == 1L && !cleaned(50L)._1.contains(banner))
    assert(cleaned(51L) == (("hello", 1L)))
    val curated = spark.read.parquet(s"$dir/cur/curated")
      .select("doc_id").as[Long].collect().toSeq
    assert(curated == Seq(50L), s"curated drifted: $curated")
    // 51 was rejected for its RESIDUE being short, not for the banner
    val qRejects = spark.read.parquet(s"$dir/cur/quality_reject")
      .select("doc_id", "violated").as[(Long, String)].collect().toSet
    assert(qRejects == Set((51L, "TOO_SHORT")))
    // tier-0 state advanced exactly once despite the replay
    assert(store.currentMeta("CL").contains("0"))
    assert(LineDedupGate.lineCounts(spark, store, "CL")
      .filter(col("line") === banner).as[(String, Long)].collect()
      .head._2 == 2L)
  }

  test("an empty zero-partition replayed batch flows through the ladder without wedging") {
    // a replayed empty micro-batch arrives with ZERO partitions, so its
    // committed epochs hold no parquet part files — every tier-boundary
    // read-back must fall back to a schema-preserving empty frame
    // instead of dying on "unable to infer schema" in a retry loop
    val dir = Files.createTempDirectory("graft-curation-empty").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationempty_idx", "doc_id", "text")
    val emptyBatch = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(emptyBatch.rdd.getNumPartitions == 0, "fixture must be zero-partition")
    val ld = Some(CurationStream.LineDedupTier(store, "CE"))
    CurationStream.applyBatch(spark, emptyBatch, 0L, constraints,
      "curationempty_idx", "doc_id", "text", s"$dir/cur", lineDedup = ld)
    // the replay (the exact wedge scenario) must also complete
    CurationStream.applyBatch(spark, emptyBatch, 0L, constraints,
      "curationempty_idx", "doc_id", "text", s"$dir/cur", lineDedup = ld)
    assert(EpochCommit.epochExists(spark, s"$dir/cur/line_clean", 0L))
    // a real batch AFTER the empty one still works end-to-end
    CurationStream.applyBatch(spark,
      Seq((60L, doc("pack my box with jugs "))).toDF("doc_id", "text"),
      1L, constraints, "curationempty_idx", "doc_id", "text", s"$dir/cur",
      lineDedup = ld)
    val curated = spark.read.parquet(s"$dir/cur/curated")
      .select("doc_id").as[Long].collect().toSeq
    assert(curated == Seq(60L), s"curated drifted: $curated")
  }

  test("selection tier: curated epochs re-emerge weighted against the frozen DSIR table") {
    val dir = Files.createTempDirectory("graft-curation-sel").toString
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationsel_idx", "doc_id", "text")
    // the frozen importance artifact: trained ONCE on a labeled
    // reference corpus, persisted as a catalog table (lm2's posture)
    val ref = Seq(
      ("t", doc("sphinx of black quartz judge ")),
      ("r", doc("lorem ipsum dolor sit amet ")))
      .toDF("cls", "text").withColumn("rid", monotonically_increasing_id())
    val ratioDir = Files.createTempDirectory("graft-sel-ratio").toString
    graft.ops.TextQuality.dsirRatioTable(ref, col("cls") === "t",
        "rid", "text", buckets = 64)
      .write.mode("overwrite").parquet(ratioDir)
    // read back from disk: the tier must score against the PERSISTED
    // artifact, not a live plan (and temp views keep re-runs idempotent
    // — saveAsTable left warehouse debris that broke the second run)
    spark.read.parquet(ratioDir).createOrReplaceTempView("curationsel_ratio")
    val sel = Some(CurationStream.SelectionTier("curationsel_ratio", buckets = 64))

    val b0 = Seq(
      (70L, doc("sphinx of black quartz judge ")), // target-like
      (71L, doc("lorem ipsum dolor sit amet "))) // reference-like
      .toDF("doc_id", "text")
    CurationStream.applyBatch(spark, b0, 0L, constraints,
      "curationsel_idx", "doc_id", "text", s"$dir/cur", selection = sel)
    // replay: stateless vs a frozen artifact ⇒ epoch-dir no-op
    CurationStream.applyBatch(spark, b0, 0L, constraints,
      "curationsel_idx", "doc_id", "text", s"$dir/cur", selection = sel)

    val w = spark.read.parquet(s"$dir/cur/weighted/epoch=0")
      .select("doc_id", "n_features", "dsir_score")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(w.keySet == Set(70L, 71L), "every curated doc must be weighted")
    assert(w(70L)._2 > w(71L)._2,
      s"target-like doc must weight higher: $w")
    // the streamed weights ARE the batch computation against the same
    // frozen table on the same curated prefix
    val batch = graft.ops.TextQuality.dsirScoreAgainst(
        spark.read.parquet(s"$dir/cur/curated/epoch=0"),
        "doc_id", "text", spark.table("curationsel_ratio"), buckets = 64)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(w == batch, "streamed weights drifted from the batch computation")
  }

  test("quota tier: budgets bind across triggers on what the ladder actually ships") {
    val dir = Files.createTempDirectory("graft-curation-quota").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationquota_idx", "doc_id", "text")
    // doc() is 6×5 = 30 whitespace tokens; budget 70 admits two docs
    // of source w and leaves no room for a third
    val budgets = Seq(("w", 70L)).toDF("source", "budget")
    val qt = Some(CurationStream.QuotaTier(store, "CQ", "source", budgets))

    // trigger 0: 80 quality-rejects (short — must NOT burn quota),
    // 81/82 curated and admitted (30 + 30 ≤ 70)
    CurationStream.applyBatch(spark,
      Seq((80L, "w", "too short"),
        (81L, "w", doc("pack my box with jugs ")),
        (82L, "w", doc("sphinx of black quartz judge ")))
        .toDF("doc_id", "source", "text"),
      0L, constraints, "curationquota_idx", "doc_id", "text", s"$dir/cur",
      quota = qt)
    val a0 = spark.read.parquet(s"$dir/cur/admitted/epoch=0")
      .select("doc_id").as[Long].collect().toSet
    assert(a0 == Set(81L, 82L), s"admitted drifted: $a0")
    assert(QuotaGate.consumed(spark, store, "CQ")
      .as[(String, Long)].collect().toMap == Map("w" -> 60L),
      "only shipped docs may burn quota")

    // trigger 1: a new doc (60 + 30 > 70) hits the exhausted budget
    CurationStream.applyBatch(spark,
      Seq((83L, "w", doc("how vexingly daft zebras jump ")))
        .toDF("doc_id", "source", "text"),
      1L, constraints, "curationquota_idx", "doc_id", "text", s"$dir/cur",
      quota = qt)
    val r1 = spark.read.parquet(s"$dir/cur/quota_reject/epoch=1")
      .select("doc_id", "reason").as[(Long, String)].collect().toSet
    assert(r1 == Set((83L, "QUOTA_EXHAUSTED")))
    // replay the whole ladder: every tier including the quota no-ops
    val v = store.currentVersion("CQ")
    CurationStream.applyBatch(spark,
      Seq((83L, "w", doc("how vexingly daft zebras jump ")))
        .toDF("doc_id", "source", "text"),
      1L, constraints, "curationquota_idx", "doc_id", "text", s"$dir/cur",
      quota = qt)
    assert(store.currentVersion("CQ") == v)
  }

  test("quota accounting always uses engine tokenization: a caller-supplied n_tokens column is overwritten") {
    val dir = Files.createTempDirectory("graft-curation-tok").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationtok_idx", "doc_id", "text")
    val budgets = Seq(("w", 70L)).toDF("source", "budget")
    // the input stream carries its OWN n_tokens column with absurd
    // counts (1 and 1,000,000); if the quota tier honored them, doc 91
    // would reject and the chain would record 1 consumed token — the
    // engine recomputes (30 whitespace tokens per doc), so both admit
    // and the chain records 60
    CurationStream.applyBatch(spark,
      Seq((90L, "w", doc("pack my box with jugs "), 1L),
        (91L, "w", doc("sphinx of black quartz judge "), 1000000L))
        .toDF("doc_id", "source", "text", "n_tokens"),
      0L, constraints, "curationtok_idx", "doc_id", "text", s"$dir/cur",
      quota = Some(CurationStream.QuotaTier(store, "CTK", "source", budgets)))
    val a0 = spark.read.parquet(s"$dir/cur/admitted/epoch=0")
      .select("doc_id").as[Long].collect().toSet
    assert(a0 == Set(90L, 91L),
      s"quota must charge engine token counts, not caller-supplied: $a0")
    assert(QuotaGate.consumed(spark, store, "CTK")
      .as[(String, Long)].collect().toMap == Map("w" -> 60L),
      "consumed-token state must reflect engine tokenization")
  }

  test("upsample tier: quota admissions repeat toward budget, prefix-exact across triggers") {
    val dir = Files.createTempDirectory("graft-curation-up").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val upStore = new SnapshotStore(spark, s"$dir/upstore")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationup_idx", "doc_id", "text")
    // quota 70 ships two 30-token docs of w; upsample budget 300 then
    // repeats the shipped 60 tokens 300/60 = 5 → clamped to maxEpochs 4
    val qt = Some(CurationStream.QuotaTier(store, "CUQ", "source",
      Seq(("w", 70L)).toDF("source", "budget")))
    val upBudgets = Seq(("w", 300L)).toDF("source", "budget")
    val ut = Some(CurationStream.UpsampleTier(upStore, "CUU", "source",
      upBudgets))
    CurationStream.applyBatch(spark,
      Seq((90L, "w", "too short"),
        (91L, "w", doc("pack my box with jugs ")),
        (92L, "w", doc("sphinx of black quartz judge ")))
        .toDF("doc_id", "source", "text"),
      0L, constraints, "curationup_idx", "doc_id", "text", s"$dir/cur",
      quota = qt, upsample = ut)
    // the upsampled epoch = batch epochUpsample over what the quota
    // SHIPPED (60 tokens vs budget 300 → 4 copies each after clamp)
    val up0 = spark.read.parquet(s"$dir/cur/upsampled/epoch=0")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(up0 == Map(91L -> 4L, 92L -> 4L), s"upsampled drifted: $up0")
    // trigger 1: quota is exhausted — nothing ships, nothing repeats,
    // but the refresh re-emits the prefix (factors unchanged)
    CurationStream.applyBatch(spark,
      Seq((93L, "w", doc("how vexingly daft zebras jump ")))
        .toDF("doc_id", "source", "text"),
      1L, constraints, "curationup_idx", "doc_id", "text", s"$dir/cur",
      quota = qt, upsample = ut)
    assert(spark.read.parquet(s"$dir/cur/up_admitted/epoch=1").count() == 0L)
    val up1 = spark.read.parquet(s"$dir/cur/upsampled/epoch=1")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(up1 == up0, "prefix sample must carry the shipped corpus forward")
    // the gate's totals track only SHIPPED tokens
    assert(UpsampleGate.totals(spark, upStore, "CUU")
      .as[(String, Long)].collect().toMap == Map("w" -> 60L))
    // replay the whole ladder: every tier including upsample no-ops
    val v = upStore.currentVersion("CUU")
    CurationStream.applyBatch(spark,
      Seq((93L, "w", doc("how vexingly daft zebras jump ")))
        .toDF("doc_id", "source", "text"),
      1L, constraints, "curationup_idx", "doc_id", "text", s"$dir/cur",
      quota = qt, upsample = ut)
    assert(upStore.currentVersion("CUU") == v,
      "a replayed trigger must not grow the upsample chain")
  }

  test("mixture tier: exact temperature sample over the curated prefix; quota charges each admit once") {
    val dir = Files.createTempDirectory("graft-curation-mix").toString
    val mixStore = new SnapshotStore(spark, s"$dir/mixstore")
    val quotaStore = new SnapshotStore(spark, s"$dir/quotastore")
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationmix_idx", "doc_id", "text")
    // pairwise-disjoint vocabularies (15 tokens each): every doc passes
    // quality AND the signature tier, so the mixture sees them all
    def mkDoc(i: Long, src: String) =
      (i, src, (1 to 15).map(j => s"w${i}_$j").mkString(" "))
    val mt = Some(CurationStream.MixtureTier(mixStore, "CM", "source"))
    // non-binding budget: isolates the charge accounting from the cut
    val qt = Some(CurationStream.QuotaTier(quotaStore, "CMQ", "source",
      Seq(("a", 100000L), ("b", 100000L)).toDF("source", "budget")))
    val b0 = ((1L to 6L).map(mkDoc(_, "a")) :+ mkDoc(100L, "b"))
      .toDF("doc_id", "source", "text")
    val b1 = (101L to 104L).map(mkDoc(_, "b")).toDF("doc_id", "source", "text")
    Seq(b0, b1).zipWithIndex.foreach { case (b, k) =>
      CurationStream.applyBatch(spark, b, k.toLong, constraints,
        "curationmix_idx", "doc_id", "text", s"$dir/cur",
        mixture = mt, quota = qt)
      // the mixture epoch IS the batch temperatureSample over the
      // curated prefix (epochs 0..k), row-for-row
      val prefix = spark.read.parquet(s"$dir/cur/curated").drop("epoch")
      val want = graft.ops.Stats.temperatureSample(prefix, "source", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      val got = spark.read.parquet(s"$dir/cur/mixture/epoch=$k")
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"mixture epoch $k drifted from the batch sample")
    }
    // b catching up (1 → 5 docs vs a's 6) raises a's rate: the refreshed
    // sample may re-admit a trigger-0 a-doc at epoch 1, but the QUOTA is
    // charged per doc exactly once, at its arrival trigger — consumed
    // equals 15 tokens × the UNION of the admit epochs, not the sum of
    // the refreshed samples
    val admits = (0 to 1).map(k =>
      spark.read.parquet(s"$dir/cur/mix_admitted/epoch=$k")
        .select("doc_id").as[Long].collect().toSet)
    assert(admits(0).size + admits(1).size == (admits(0) ++ admits(1)).size,
      "admit epochs must be disjoint")
    val consumed = QuotaGate.consumed(spark, quotaStore, "CMQ")
      .as[(String, Long)].collect().map(_._2).sum
    assert(consumed == 15L * (admits(0) ++ admits(1)).size,
      s"quota must charge each admitted doc exactly once: $consumed")
    // full-ladder replay: every tier no-ops (state versions pinned)
    val (vm, vq) = (mixStore.currentVersion("CM"), quotaStore.currentVersion("CMQ"))
    CurationStream.applyBatch(spark, b1, 1L, constraints,
      "curationmix_idx", "doc_id", "text", s"$dir/cur",
      mixture = mt, quota = qt)
    assert(mixStore.currentVersion("CM") == vm &&
      quotaStore.currentVersion("CMQ") == vq)
  }

  test("semantic tier: an embedding near-dup passes tiers 1-2 and is blocked at tier 3") {
    val dir = Files.createTempDirectory("graft-curation-sem").toString
    DedupIndex.build(Seq((1L, doc("the quick brown fox ")))
      .toDF("doc_id", "text"), "curationsem_sig", "doc_id", "text")
    // semantic corpus: the unit axes (SemanticIngestGateSpec's geometry)
    AnnIndex.buildIvf(Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("vec_id", "embedding"), "curationsem_ann",
      nCentroids = 2, refine = 0, buckets = 2)

    // 40: textually NEW but embedding-identical to stored vector 100 —
    // only the semantic tier can catch it. 41: new in both spaces.
    val batch = Seq(
      (40L, doc("sphinx of black quartz judge "), Array(1f, 0f)),
      (41L, doc("how vexingly daft zebras jump "), Array(0.6f, 0.8f)))
      .toDF("doc_id", "text", "embedding")
    CurationStream.applyBatch(spark, batch, 0L, constraints,
      "curationsem_sig", "doc_id", "text", s"$dir/cur",
      semantic = Some(CurationStream.SemanticTier("curationsem_ann", "embedding")))

    // both passed the signature tier (sig_pass holds 40 and 41)…
    val sigPass = spark.read.parquet(s"$dir/cur/sig_pass")
      .select("doc_id").as[Long].collect().toSet
    assert(sigPass == Set(40L, 41L))
    // …but only 41 survived the semantic tier
    val curated = spark.read.parquet(s"$dir/cur/curated")
      .select("doc_id").as[Long].collect().toSeq
    assert(curated == Seq(41L), s"semantic tier must block 40: $curated")
    val sem = spark.read.parquet(s"$dir/cur/sem_reject")
      .select("doc_id", "dup_of", "reason").as[(Long, Long, String)]
      .collect().toSet
    assert(sem == Set((40L, 100L, "DUP_OF_CORPUS")))
    // the embedding column rode through tiers 1-2 as payload
    assert(spark.read.parquet(s"$dir/cur/curated").columns.contains("embedding"))
  }
}
