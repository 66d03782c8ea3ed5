package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality operators a training-data pipeline runs after the
  * per-document stats in [[TextAnalysis]]: repetition signals, TF-IDF
  * keyword extraction, PII redaction, vocabulary / adjacent-pair counts.
  *
  * Scale design: everything explode-based shuffles on (doc, gram) or
  * (gram) with map-side partial aggregation — the word-count shape that
  * scales linearly; nothing materializes per-document n-gram arrays
  * through a shuffle. Redaction is a narrow codegen'd projection.
  */
object TextQuality {

  /** Spread rows across cores when the source planned few partitions
    * (single-file test parquet scans as ONE split) WITHOUT hashing
    * document text as a shuffle key: a round-robin exchange moves the
    * same bytes but computes no multi-KB key hashes and cannot skew on
    * duplicate texts — and it is skipped entirely when the scan
    * already has enough splits, which at 100 TB it always does.
    *
    * The split estimate uses metadata only (leaf file list + catalyst
    * size stats / the 128 MB split default) — `df.rdd` would finalize
    * the adaptive plan and EXECUTE any upstream exchanges just to read
    * a partition count, running the caller's pipeline twice.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val splitBytes = 128L * 1024 * 1024
    // no leaf files ⇒ no trustworthy estimate: plan-level sizeInBytes on
    // non-file sources is the Long.MaxValue-ish default sentinel, which
    // would silently skip the repartition this helper exists to apply
    val estSplits =
      if (df.inputFiles.isEmpty) 0L
      else math.max(
        df.inputFiles.length.toLong,
        (df.queryExecution.analyzed.stats.sizeInBytes / splitBytes).toLong)
    if (estSplits >= target) df else df.repartition(target)
  }

  /** Per-document repetition signals (the Gopher/C4-style quality
    * filters): fraction of tokens that are the single most frequent
    * token, and fraction of trigram occurrences belonging to a trigram
    * seen more than once in the document. High values flag boilerplate
    * and degenerate repetition.
    *
    * Two (doc, gram) aggregations joined on doc — each is one shuffle
    * with partial aggregation; the join keys are co-partitioned on
    * doc id by construction.
    */
  /** Bigram-LM fluency score: each document scored by the average
    * in-corpus conditional bigram probability of its own bigrams —
    * avg over the doc's bigram instances of P(w₂|w₁) where
    * P(w₂|w₁) = corpusCount(w₁w₂) / corpusCount(w₁·) — the log-free,
    * engine-exact stand-in for LM-perplexity quality filtering (a
    * Wenzek/CCNet-style signal: boilerplate and in-distribution prose
    * score high, shuffled or out-of-domain token soup scores low).
    *
    * Scale: two word-count shapes (bigram counts, prefix totals — both
    * vocab²-bounded with map-side partials) plus one data-sized join
    * from doc bigrams onto those tables, keyed on the bigram — the
    * n-gram-LM training layout. Exactness: every per-bigram term
    * quantizes to millionths BEFORE the per-doc sum (int64-exact across
    * any partitioning), and the final division runs one fixed floor
    * sequence — no float accumulation order anywhere.
    */
  def bigramFluency(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df0.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col(idCol))
    val bigrams = toks.select(col(idCol), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(true) // feeds the counts AND the scoring join
    val cb = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    bigrams
      .join(cb, Seq("w1", "w2"))
      .join(cp, Seq("w1"))
      .select(col(idCol),
        floor(col("cb").cast("double") * 1000000.0 / col("cp") + 0.5)
          .cast("long").as("t6"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(col("t6")).cast("double") / count(lit(1)) + 0.5) / 1000000.0)
          .as("fluency6"))
      .orderBy(col(idCol))
  }

  /** Train the frozen bigram-LM table [[scoreAgainstLm]] scores
    * against — the production CCNet/Wenzek posture, where the LM
    * trains ONCE on a reference corpus and new documents score against
    * the frozen counts ([[bigramFluency]] is the self-scored
    * one-corpus variant). Output: one row per observed bigram,
    * `(w1, w2, cb, cp)` with `cb` = corpus count of the bigram and
    * `cp` = corpus count of the prefix `w1·` — exactly the two tables
    * the conditional probability P(w₂|w₁) = cb/cp needs, denormalized
    * onto the bigram row so scoring pays ONE join. Vocab²-bounded;
    * persist it (plain parquet table) and it becomes the reusable LM
    * artifact of a quality pipeline.
    */
  def trainBigramLm(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df0.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col(idCol))
    val bigrams = toks.select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cp = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    cb.join(cp, Seq("w1")).select(col("w1"), col("w2"), col("cb"), col("cp"))
  }

  /** Score documents against a FROZEN LM table ([[trainBigramLm]]'s
    * layout): avg over the doc's bigram instances of the quantized
    * P(w₂|w₁), with UNSEEN bigrams contributing exactly 0 (the
    * left-join null → no-smoothing convention; out-of-domain text
    * scores toward 0 instead of being dropped). Same exactness
    * discipline as [[bigramFluency]]: millionth-quantized terms before
    * the int64 sum, one fixed floor sequence at the end. Scale: one
    * data-sized join from doc bigrams onto the vocab²-bounded LM table,
    * keyed on the bigram. Documents with fewer than two tokens have no
    * bigrams and are absent from the output (score them by policy at
    * the caller — the streaming gate treats missing as failing).
    */
  def scoreAgainstLm(
      lm: DataFrame, df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df0.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col(idCol))
    val bigrams = toks.select(col(idCol), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    bigrams
      .join(lm, Seq("w1", "w2"), "left")
      .select(col(idCol),
        coalesce(
          floor(col("cb").cast("double") * 1000000.0 / col("cp") + 0.5)
            .cast("long"),
          lit(0L)).as("t6"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(col("t6")).cast("double") / count(lit(1)) + 0.5) / 1000000.0)
          .as("fluency6"))
  }

  /** DSIR-style importance scoring for data selection (after Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): hashed n-gram (unigram + bigram) features bucket
    * into `buckets` cells, the TARGET slice's bucket distribution p̂
    * and the RAW corpus's q̂ are add-1 smoothed, and each document
    * scores by how target-like its features are. The score is the
    * engine-exact LOG-FREE surrogate this codebase uses wherever the
    * paper says log (lm1's precedent): the arithmetic mean over the
    * doc's feature instances of the millionth-quantized importance
    * ratio r(b) = p̂(b)/q̂(b), instead of the paper's mean log-ratio —
    * same selection spirit (documents whose features look drawn from
    * the target distribution score high), none of libm's cross-engine
    * non-reproducibility. Hashing is md5-prefix ([[graft.ops.Dedup.hash32]]),
    * so buckets are identical in any engine.
    *
    * Scale: feature extraction is the word-count shape (explode +
    * B-bounded aggregation with map-side partials); the distributions
    * and ratio table are B rows (broadcast); scoring is one data-sized
    * join from feature instances onto the B-row table. The quantized
    * ratio arithmetic stays exact: both products are exact in double
    * (counts ≪ 2²⁶), and the one division + scale runs in a fixed
    * IEEE sequence mirrored in the oracle.
    *
    * Output: (idCol, n_features, dsir_score) per document.
    */
  def dsirScores(
      df0: DataFrame, isTarget: Column, idCol: String, textCol: String,
      buckets: Int = 256): DataFrame = {
    val toks = df0.select(col(idCol), isTarget.as("__t"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col(idCol))
    val uni = toks.select(col(idCol), col("__t"), explode(col("w")).as("g"))
    val big = toks.select(col(idCol), col("__t"), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .select(col(idCol), col("__t"),
        concat(col("b.w1"), lit(" "), col("b.w2")).as("g"))
    // hashing feeds BOTH distributions and the scoring join — hash once
    val feats = uni.unionByName(big)
      .select(col(idCol), col("__t"),
        pmod(graft.ops.Dedup.hash32(concat(lit("dsir|"), col("g"))),
          lit(buckets)).as("bkt"))
      .localCheckpoint(true)
    val dist = feats.groupBy(col("bkt")).agg(
      count(lit(1)).as("cq"),
      count(when(col("__t"), 1)).as("ct"))
    val totals = dist.agg(sum(col("cq")).as("tq"), sum(col("ct")).as("tt"))
    val ratio = dist.crossJoin(broadcast(totals))
      .select(col("bkt"),
        floor((col("ct") + 1).cast("double") * (col("tq") + buckets)
          / ((col("cq") + 1).cast("double") * (col("tt") + buckets))
          * 1000000.0 + 0.5).cast("long").as("r6"))
    feats.join(broadcast(ratio), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        (floor(sum(col("r6")).cast("double") / count(lit(1)) + 0.5) / 1000000.0)
          .as("dsir_score"))
  }

  /** Hashed unigram+bigram feature-bucket instances — [[dsirScores]]'
    * extraction stage, shared with the frozen-table scorer. One row per
    * feature instance: (idCol, extra…, bkt).
    */
  private def dsirFeatures(df0: DataFrame, extra: Seq[Column],
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    val toks = df0.select(
        (col(idCol) +: extra :+ TextAnalysis.tokens(col(textCol)).as("w")): _*)
      .repartition(col(idCol))
    val keep = toks.columns.filterNot(_ == "w").map(col).toSeq
    val uni = toks.select((keep :+ explode(col("w")).as("g")): _*)
    val big = toks.select((keep :+ explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b")): _*)
      .select((keep :+ concat(col("b.w1"), lit(" "), col("b.w2")).as("g")): _*)
    uni.unionByName(big)
      .select((keep :+ pmod(graft.ops.Dedup.hash32(
        concat(lit("dsir|"), col("g"))), lit(buckets)).as("bkt")): _*)
  }

  /** TRAIN the frozen DSIR importance table — the B-row (bkt, r6)
    * artifact [[dsirScores]] derives internally, exposed so a pipeline
    * can compute it ONCE on a reference corpus, persist it, and score
    * every later batch against it (the lm2/cl1 train-once/score-frozen
    * posture; [[graft.streaming.CurationStream]]'s selection tier runs
    * exactly this). Same quantized add-1-smoothed ratio arithmetic as
    * dsirScores, so [[dsirScoreAgainst]] over the training corpus
    * reproduces dsirScores on it bit-for-bit (spec-pinned).
    */
  def dsirRatioTable(df0: DataFrame, isTarget: Column, idCol: String,
      textCol: String, buckets: Int = 256): DataFrame = {
    val feats = dsirFeatures(df0, Seq(isTarget.as("__t")), idCol, textCol, buckets)
    val dist = feats.groupBy(col("bkt")).agg(
      count(lit(1)).as("cq"),
      count(when(col("__t"), 1)).as("ct"))
    val totals = dist.agg(sum(col("cq")).as("tq"), sum(col("ct")).as("tt"))
    // sentinel bkt = -1 (real buckets are pmod ∈ [0, B)): the UNSEEN-
    // bucket ratio under the table's own add-1 smoothing — ct = cq = 0
    // gives (0+1)(tq+B) / ((0+1)(tt+B)), which is 1.0 only when the
    // target and corpus totals happen to agree. Frozen WITH the table
    // so a scorer needs no access to the training totals.
    val seen = dist.crossJoin(broadcast(totals))
      .select(col("bkt"),
        floor((col("ct") + 1).cast("double") * (col("tq") + buckets)
          / ((col("cq") + 1).cast("double") * (col("tt") + buckets))
          * 1000000.0 + 0.5).cast("long").as("r6"))
    val unseen = totals.select(lit(-1L).cast("bigint").as("bkt"),
      floor((col("tq") + buckets).cast("double")
        / (col("tt") + buckets).cast("double")
        * 1000000.0 + 0.5).cast("long").as("r6"))
    seen.unionByName(unseen)
  }

  /** Score documents against a FROZEN [[dsirRatioTable]] — per doc the
    * arithmetic mean of its feature buckets' quantized importance
    * ratios, never touching the training corpus. A bucket absent from
    * the frozen table (never seen in training — only possible when the
    * training corpus had fewer instances than buckets) contributes the
    * table's own sentinel bkt = -1 ratio — (tq+B)/(tt+B), the value the
    * table's add-1 smoothing actually assigns an untrained bucket
    * (p̂ = 1/(tt+B) mass but q̂ = 1/(tq+B): the two totals differ, so
    * the ratio is NOT 1 in general). Tables frozen before the sentinel
    * existed fall back to the old neutral 10⁶ (ratio 1.0). Scale: one
    * data-sized join from feature instances onto the broadcast B-row
    * table plus a broadcast 1-row scalar — flat per trigger.
    *
    * Output: (idCol, n_features, dsir_score).
    */
  def dsirScoreAgainst(docs: DataFrame, idCol: String, textCol: String,
      ratio: DataFrame, buckets: Int = 256): DataFrame = {
    // always one row: max(when...) is null when no sentinel is frozen
    val fallback = ratio.agg(coalesce(
      max(when(col("bkt") === -1L, col("r6"))), lit(1000000L)).as("__fb6"))
    dsirFeatures(docs, Nil, idCol, textCol, buckets)
      .join(broadcast(ratio.filter(col("bkt") >= 0L)), Seq("bkt"), "left")
      .crossJoin(broadcast(fallback))
      .select(col(idCol), coalesce(col("r6"), col("__fb6")).as("r6"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        (floor(sum(col("r6")).cast("double") / count(lit(1)) + 0.5) / 1000000.0)
          .as("dsir_score"))
  }

  /** Train the multinomial class-affinity model [[classifyByLift]]
    * scores with — the naive-Bayes-shaped text classifier of a quality
    * pipeline (CCNet's fastText language filter, GPT-3's quality
    * classifier), in this codebase's engine-exact log-free form.
    * One row per observed (token, class): the add-1-smoothed lift
    * P(w|c)/P(w) quantized to millionths,
    * lift6 = ⌊(cwc+1)(tot+V) / ((cc+V)(cw+1)) · 10⁶ + ½⌋, where cwc =
    * count of w in class c, cc = class token total, cw = corpus count
    * of w, tot = corpus token total, V = vocabulary size. Both products
    * stay exact in double (counts ≪ 2²⁶ against multipliers ≪ 2²⁶),
    * and the one division + scale runs a fixed IEEE sequence — dsir1's
    * argument, so a frozen model scores identically in any engine.
    *
    * Also carried per row: `cc` and the global (tot, V) — everything a
    * scorer needs to synthesize the UNSEEN-pair lift
    * ⌊(tot+V)/((cc+V)(cw+1))·10⁶+½⌋ without re-reading the training
    * corpus. The class table (label, cc) rides along denormalized
    * because |classes| is a small constant. Vocab×classes-bounded;
    * persist as plain parquet and it is the classifier artifact.
    *
    * Scale: token extraction is the word-count shape (explode +
    * vocab-bounded aggregation with map-side partials); everything
    * after the (w, label) count is vocab-sized or smaller.
    */
  def trainClassLift(
      df0: DataFrame, labelCol: String, textCol: String): DataFrame = {
    val ti = df0
      .select(col(labelCol).as("label"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col("label"))
      .select(col("label"), explode(col("w")).as("w"))
    val cwc = ti.groupBy(col("w"), col("label")).agg(count(lit(1)).as("cwc"))
      .localCheckpoint(true) // feeds cc, cw, totals AND the model rows
    val cc = cwc.groupBy(col("label")).agg(sum(col("cwc")).as("cc"))
    val cw = cwc.groupBy(col("w")).agg(sum(col("cwc")).as("cw"))
    val glob = cwc.agg(sum(col("cwc")).as("tot"),
      count_distinct(col("w")).as("v"))
    cwc.join(broadcast(cc), Seq("label"))
      .join(cw, Seq("w"))
      .crossJoin(broadcast(glob))
      .select(col("w"), col("label"),
        floor((col("cwc") + 1).cast("double") * (col("tot") + col("v"))
          / ((col("cc") + col("v")).cast("double") * (col("cw") + 1))
          * 1000000.0 + 0.5).cast("long").as("lift6"),
        col("cw"), col("cc"), col("tot"), col("v"))
  }

  /** Classify documents against a [[trainClassLift]] model: each doc's
    * affinity to class c is the arithmetic mean over its token
    * instances of the quantized lift (the log-free surrogate for the
    * naive-Bayes log-likelihood sum — lm1/dsir1's precedent), and the
    * prediction is the argmax with ties broken to the
    * lexicographically-first class. Tokens never seen in training
    * contribute the fully-smoothed lift (cw = 0, cwc = 0); tokens seen
    * but not in class c contribute the cwc = 0 lift — both synthesized
    * from the model's denormalized (cc, tot, v), so scoring never
    * touches the training corpus.
    *
    * Scale: ONE data-sized join from the doc's token instances onto
    * the vocab-sized (w → cw) projection, a constant |classes|-way
    * fan-out against the broadcast class table, one (doc, class)
    * aggregation, then an argmax on the |docs|×|classes| table — the
    * per-token work is flat in corpus size and the shuffles are keyed
    * on doc id. Output: (idCol, predicted, score6).
    */
  def classifyByLift(
      model: DataFrame, df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val classes = model.groupBy(col("label")).agg(
      first(col("cc")).as("cc"), first(col("tot")).as("tot"),
      first(col("v")).as("v"))
    val cw = model.groupBy(col("w")).agg(first(col("cw")).as("cw"))
    val toks = df0
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
      .repartition(col(idCol))
      .select(col(idCol), explode(col("w")).as("w"))
    val terms = toks
      .join(cw, Seq("w"), "left")
      .crossJoin(broadcast(classes))
      .join(model.select(col("w"), col("label"), col("lift6")),
        Seq("w", "label"), "left")
      .select(col(idCol), col("label"),
        // absent (w,label) row ⇒ cwc = 0 ⇒ numerator (0+1)(tot+V);
        // the float sequence mirrors trainClassLift's exactly
        coalesce(col("lift6"),
          floor(lit(1).cast("double") * (col("tot") + col("v"))
            / ((col("cc") + col("v")).cast("double")
              * (coalesce(col("cw"), lit(0L)) + 1))
            * 1000000.0 + 0.5).cast("long")).as("l6"))
    val scored = terms.groupBy(col(idCol), col("label"))
      .agg(floor(sum(col("l6")).cast("double") / count(lit(1)) + 0.5)
        .cast("long").as("s6"))
    scored.groupBy(col(idCol))
      .agg(min_by(col("label"), struct((-col("s6")).as("neg"), col("label")))
        .as("predicted"),
        max(col("s6")).as("score6"))
  }

  def repetitionSignals(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    // single-file parquet plans as ONE partition; the interpreted n-gram
    // lambdas are CPU-heavy, so spread rows across cores first
    val df = df0.select(col(idCol), col(textCol)).repartition(col(idCol))
    val uni = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        TextAnalysis.round6(max(col("c")).cast("double") / sum(col("c")))
          .as("top_unigram_frac"))
    // opaque(): without the barrier CollapseProject inlines the split
    // into every element_at reference inside the shingle lambda
    val tri = df.select(col(idCol),
        graft.functions.ArrayHashes.opaque(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(col(idCol), explode(TextAnalysis.shinglesOf(col("w"), 3)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        TextAnalysis.round6(
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") / sum(col("c")))
          .as("dup_trigram_frac"))
    uni.join(tri, Seq(idCol))
  }

  /** Top-k keywords per document by log-free TF-IDF: score =
    * (term count × corpus size) / (doc length × doc frequency) — the
    * same ordering as tf·(N/df), kept as one integer-ratio division so
    * the score is bit-identical in any IEEE engine (ln() is not
    * correctly-rounded across libm implementations, so a log idf would
    * break cross-engine rank ties).
    */
  def tfIdfKeywords(df0: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val df = df0.select(col(idCol), col(textCol)).repartition(col(idCol))
    val tf = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("cnt"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("cnt")).as("len"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n"))
    val scored = tf.join(dl, Seq(idCol)).join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        TextAnalysis.round6((col("cnt") * col("n")).cast("double")
          / (col("len") * col("df"))).as("score"))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))))
      .filter(col("rn") <= k)
  }

  /** PII patterns kept engine-portable (no lookarounds, no \\d shorthand
    * differences): email and a +1-555 phone shape.
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRe = "\\+1-555-[0-9]{4}"

  /** Redact emails/phones and count what was removed — the masking pass
    * every shareable corpus needs. Narrow projection, codegen'd regex.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col(textCol), emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
    df.withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(phoneRe), lit(0))).cast("long"))
      .withColumn(textCol, redacted)
  }

  /** Corpus-wide top-k vocabulary with counts (tokenizer/vocab
    * construction). One (token) shuffle with partial agg, then a
    * TakeOrderedAndProject — no full sort.
    */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    spread(df.select(col(textCol)))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      // post-limit(k) the input is bounded: the single-job bounded rank
      // replaces withGlobalRank's 3-pass machinery, and still windows
      // over a declared partition key
      .transform(Ranking.withBoundedRank(_, "rank",
        Seq(col("n").desc, col("token").asc)))

  /** Tokenize against a broadcast top-k vocabulary (rank = token id,
    * OOV = 0): the map-side id-mapping step before tokenizer sharding.
    * Emits a digest per document (count, OOV count, md5 of the id
    * sequence) so arbitrarily long id arrays stay hash-comparable.
    * The vocab side is tiny and broadcast; the corpus never shuffles
    * except the per-doc regroup.
    */
  def tokenizeIds(df: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    val vocab = vocabTopK(df, textCol, vocabK)
      .select(col("token"), col("rank").cast("long").as("tid"))
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    toks.join(broadcast(vocab), toks("tok") === vocab("token"), "left")
      .select(col(idCol), col("pos"), coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          x => x.getField("tid").cast("string")), ",")).as("ids_md5"))
  }

  /** Inverted index (term → sorted posting list of doc ids), emitted as
    * a digest (df + md5 of the comma-joined postings) so wide lists stay
    * hash-comparable. One (term, doc) distinct + one term shuffle;
    * `minDf` bounds output to terms worth indexing.
    *
    * `maxDf` is the hot-term guard (the same one
    * [[Dedup.ngramContainmentPairs]] uses): without it a stop-word term
    * aggregates ~|corpus| doc ids into ONE grouped row — a
    * single-reducer hot key holding a corpus-sized array before the
    * digest. A first constant-state count pass finds terms with
    * df > maxDf (a tiny set by construction — only boilerplate terms
    * exceed any sane cap), and a broadcast anti-join drops their rows
    * MAP-SIDE, before the exchange — so the hot keys never reach the
    * collect shuffle at all, and every surviving posting list is
    * ≤ maxDf by checked precondition, not by hope.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long = Long.MaxValue): DataFrame =
    invertedIndexTerms(df, idCol,
      array_distinct(TextAnalysis.tokens(col(textCol))), minDf, maxDf)

  /** [[invertedIndex]] over an arbitrary per-document term array —
    * unigram tokens, n-gram shingles (a phrase index), normalized
    * entities, whatever the caller extracts. `terms` must already be
    * distinct per document.
    */
  def invertedIndexTerms(df: DataFrame, idCol: String, terms: Column,
      minDf: Long, maxDf: Long = Long.MaxValue): DataFrame = {
    val td = df.select(col(idCol), explode(terms).as("term"))
    val hot = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("term")
    val pruned = if (maxDf == Long.MaxValue) td // unguarded: skip the count pass
      else td.join(broadcast(hot), Seq("term"), "left_anti")
    pruned
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        md5(array_join(transform(sort_array(collect_list(col(idCol))),
          x => x.cast("string")), ",")).as("postings_md5"))
      .filter(col("df") >= minDf)
  }

  /** Adjacent-pair co-occurrence lift: n_ab·N / (n_a·n_b) — PMI without
    * the log (identical ranking, and integer-ratio arithmetic keeps the
    * score engine-exact; ln() is not correctly-rounded across libms).
    * Output: pairs with ≥ `minPairCount` occurrences ranked by
    * (lift desc, a, b), top `k`.
    */
  def cooccurrenceLift(df: DataFrame, textCol: String,
      minPairCount: Long, k: Int): DataFrame = {
    val t = col("w")
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val toks = spread(df.select(col(textCol)))
      .select(graft.functions.ArrayHashes.opaque(TextAnalysis.tokens(col(textCol))).as("w"))
      .localCheckpoint(true)
    val unigrams = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val nTotal = toks.select(explode(col("w")).as("tok")).agg(count(lit(1)).as("n_corpus"))
    val pairCounts = toks.select(explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairCounts
      .join(unigrams.select(col("tok").as("a"), col("n_tok").as("n_a")), Seq("a"))
      .join(unigrams.select(col("tok").as("b"), col("n_tok").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nTotal))
      .select(col("a"), col("b"), col("n_pair"),
        TextAnalysis.round6((col("n_pair") * col("n_corpus")).cast("double")
          / (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }

  /** BM25 top-k keyword retrieval over the corpus — the ranked-search
    * counterpart to [[invertedIndex]]. Classic Okapi shape with k1=1.2,
    * b=0.75, but a log-free rational IDF `(N - df + ½)/(df + ½)` so
    * every arithmetic step is IEEE-exact across engines (`ln` is not
    * correctly rounded across libms — same trade [[cooccurrenceLift]]
    * makes; swap the log in at deploy if classical BM25 weights are
    * required). Per-term scores quantize to 10⁻⁶ fixed point before the
    * per-doc sum, so the distributed summation is order-independent.
    *
    * Scale shape: document lengths and corpus stats come from one
    * narrow scan (no shuffle); term frequencies shuffle ONLY documents
    * containing a query term (map-side `isin` filter before the
    * exchange); df and corpus stats broadcast. Nothing is proportional
    * to |vocabulary| — only to |matching docs| · |terms|.
    */
  def bm25TopK(df0: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val docs = df0.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("w"))
    val lens = docs.select(col(idCol), size(col("w")).cast("long").as("dl"))
    // avgdl enters as the exact rational dl·N/S — no double division
    // until the final score expression, which both engines evaluate on
    // identical operand trees
    val stats = lens.agg(sum(col("dl")).as("s_dl"), count(lit(1)).as("n_docs"))
    val tf = docs.select(col(idCol), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(lens, Seq(idCol))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        floor((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("dl") * col("n_docs") / col("s_dl")))
          * 1000000.0 + 0.5).cast("long").as("s6"))
      .groupBy(col(idCol))
      .agg(sum(col("s6")).as("score6"), count(lit(1)).as("n_terms"))
      .orderBy(col("score6").desc, col(idCol))
      .limit(k)
  }

  /** Adjacent-token-pair counts — the candidate-merge counting step of a
    * BPE trainer. Same word-count shape as vocabTopK.
    */
  def adjacentPairCounts(df: DataFrame, textCol: String, k: Int): DataFrame = {
    // tokens materialized as a column first — an inlined split would be
    // re-evaluated on every element_at reference in the lambda
    val t = col("w")
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    spread(df.select(col(textCol)))
      .select(graft.functions.ArrayHashes.opaque(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
      // bounded post-limit rank through ops.Ranking (see vocabTopK)
      .transform(Ranking.withBoundedRank(_, "rank",
        Seq(col("n").desc, col("pair").asc)))
  }

  /** BPE trainer loop ([[adjacentPairCounts]] is one round's counting
    * step): `rounds` greedy merges — each round counts adjacent token
    * pairs, picks the most frequent (count desc, then pair), and merges
    * its non-overlapping occurrences left-to-right in every document.
    * Returns the MERGE TABLE (round, pair, n) — the artifact a real
    * tokenizer trainer emits, word-level over whitespace tokens: a
    * merged token keeps an internal space. The merge itself is the
    * native codegen'd [[graft.functions.ArrayHashes.bpe_merge_pair]] —
    * one linear array pass per document (the Column-DSL fold it
    * replaced was interpreted and O(len²) per document); the DuckDB
    * oracle restates the identical left-to-right scan via
    * `list_reduce`.
    *
    * Scale: every round is the same word-count shape as bp1 — a narrow
    * per-document merge plus ONE pair-count shuffle; the chosen pair
    * rejoins as a broadcast 1-row crossJoin, so only pair counts ever
    * shuffle. Rounds are inherently sequential (a real trainer runs
    * thousands of them the same way, one agg per round); the merged
    * corpus is CHECKPOINTED between rounds — lazy chaining would
    * re-run every earlier merge each round (O(rounds²) total work),
    * exactly like a real trainer materializing the re-tokenized corpus
    * after each merge batch.
    */
  def bpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    bpeMergeTable(df, textCol, rounds)
      .select(col("round"), concat_ws(" ", col("a"), col("b")).as("pair"),
        col("n"))
      .orderBy(col("round"))

  /** [[bpeMerges]] with the pair UNserialized — (round, a, b, n). The
    * `pair` string is ambiguous to split back (a merged token keeps an
    * internal space, so "x y z" could be ("x y", "z") or ("x", "y z")),
    * and [[bpeEncode]] needs the sides separately.
    */
  def bpeMergeTable(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    var cur = spread(df.select(col(textCol)))
      .select(TextAnalysis.tokens(col(textCol)).as("w"))
    val table = (1 to rounds).map { r =>
      val w = col("w")
      val adj = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => struct(element_at(w, i).as("a"), element_at(w, i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val top1 = cur.select(explode(adj).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .localCheckpoint(true) // 1 row; both consumers reuse it
      if (r < rounds) // the last round's merged corpus has no consumer
        cur = cur.crossJoin(broadcast(top1))
          .select(graft.functions.ArrayHashes.bpe_merge_pair(
            col("w"), col("a"), col("b")).as("w"))
          .localCheckpoint(true)
      top1.select(lit(r).as("round"), col("a"), col("b"), col("n"))
    }
    table.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** BPE ENCODE against a frozen merge table — the apply half of the
    * tokenizer loop ([[bpeMergeTable]] trains it; this is what closes
    * the trained-artifact circle: merges train once, then every corpus
    * batch encodes against them, the lm2/dsir1 train-once/score-frozen
    * posture). Merges apply in rank (round) order, each as ONE
    * left-to-right non-overlapping pass — a single pass IS the fixpoint
    * for its rule (merging (a, b) never creates a new (a, b) adjacency:
    * the merged token differs from both a and b), and it is exactly the
    * rewrite the trainer itself ran, so encode(training corpus)
    * reproduces the trainer's final corpus state.
    *
    * Scale: the merge table is collected driver-side — it is the
    * vocab-bounded frozen ARTIFACT of training (the tokenizer file
    * every worker ships anyway), not data — and the whole encode
    * becomes narrow per-document projections chaining native codegen'd
    * [[graft.functions.ArrayHashes.bpe_merge_pair]] passes: no join,
    * no shuffle, no state, trivially linear in corpus bytes. Rules
    * chain in PASSES of `rulesPerPass` (default 200) projections with
    * an eager localCheckpoint between passes: at production rule
    * counts (tens of thousands of merges) a single projection would be
    * one expression tree tens of thousands deep — quadratic analyzer /
    * optimizer traversals and Janino method-size blowup or codegen
    * fallback — while the checkpoint bounds every plan the engine ever
    * sees to rulesPerPass expressions (each pass's generated code is a
    * chain of one-line calls, far under the method-split threshold).
    * ≤ rulesPerPass rules stay a single checkpoint-free projection, so
    * small vocabularies pay nothing.
    *
    * Output: (idCol, tokens array<string>) — feeds vocab-id mapping
    * and [[graft.ops.Packing]] downstream.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, rulesPerPass: Int = 200): DataFrame = {
    require(rulesPerPass > 0, "rulesPerPass must be positive")
    val rules = merges.select(col("round"), col("a"), col("b")).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val passes = rules.grouped(rulesPerPass).toSeq
    val first = docs.select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("tokens"))
    passes.zipWithIndex.foldLeft(first) { case (cur, (pass, i)) =>
      val encoded = pass.foldLeft(col("tokens")) { case (w, (a, b)) =>
        graft.functions.ArrayHashes.bpe_merge_pair(w, lit(a), lit(b))
      }
      val step = cur.select(col(idCol), encoded.as("tokens"))
      // checkpoint BETWEEN passes only — the last pass flows through
      // lazily so a downstream consumer composes with the final plan
      if (i < passes.size - 1) step.localCheckpoint(true) else step
    }
  }
}
