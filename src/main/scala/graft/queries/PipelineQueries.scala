package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Incremental, Ranking, Similarity, Stats, TextAnalysis}

/** Training-data pipeline operators over `documents` / `embeddings`
  * (dedup, similarity search, text analysis) wired into the driver
  * contract with independent DuckDB oracle restatements.
  */
object PipelineQueries extends QueryPack {

  private val wordsSql = "list_distinct(string_split_regex(trim(text), '\\s+'))"

  // ---- TX1: token stats + quality score ----------------------------------
  private def tx1TokenStats(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Ranking.orderByOnce(
      Ranking.spread(Tables.load(s, dir, "documents"), col("doc_id")).select(
        col("doc_id"),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        TextAnalysis.typeTokenRatio(t).as("ttr"),
        TextAnalysis.avgWordLen(t).as("avg_word_len"),
        TextAnalysis.punctRatio(t).as("punct_ratio"),
        TextAnalysis.qualityScore(t).as("quality")),
      col("doc_id"))
  }

  private val tx1Sql =
    """SELECT doc_id, n_tokens, ttr, avg_word_len, punct_ratio,
      |  floor((0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) + 0.3 * ttr
      |      + 0.2 * least(1.0, avg_word_len / 8.0) + 0.1 * (1.0 - punct_ratio)) * 1000000.0 + 0.5) / 1000000.0 AS quality
      |FROM (
      |  SELECT doc_id, len(w) AS n_tokens,
      |    floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0 AS ttr,
      |    floor(CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0 AS avg_word_len,
      |    floor(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |        / greatest(length(text), 1) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio
      |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---- TX2: language-ID heuristic ----------------------------------------
  private def tx2LangId(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"), col("lang").as("labeled_lang"),
      TextAnalysis.langId(col("text")).as("detected_lang"),
      TextAnalysis.stopwordHits(col("text"), "en").as("en_hits"))
      .orderBy(col("doc_id"))

  private val tx2Sql =
    s"""SELECT doc_id, labeled_lang,
      |  CASE WHEN best >= 4 THEN
      |    CASE best % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es' ELSE 'fr' END
      |  ELSE 'und' END AS detected_lang,
      |  en_hits
      |FROM (
      |  SELECT doc_id, lang AS labeled_lang, en_hits,
      |    greatest(de_hits * 4 + 0, en_hits * 4 + 1, es_hits * 4 + 2, fr_hits * 4 + 3) AS best
      |  FROM (
      |    SELECT doc_id, lang,
      |      len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS de_hits,
      |      len(list_filter(w, x -> x IN ('the','a','and','of','is','to','in'))) AS en_hits,
      |      len(list_filter(w, x -> x IN ('el','la','de','que','y'))) AS es_hits,
      |      len(list_filter(w, x -> x IN ('le','la','et','les','des'))) AS fr_hits
      |    FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w FROM documents)))
      |ORDER BY doc_id""".stripMargin

  // ---- TX3: document fingerprints ----------------------------------------
  private def tx3Fingerprint(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Ranking.spread(Tables.load(s, dir, "documents"), col("doc_id")).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        TextAnalysis.shingleFingerprint(col("text"), 5).as("shingle_fp")),
      col("doc_id"))

  private val tx3Sql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  list_min([md5(array_to_string(w[i:i+4], ' ')) for i in range(1, len(w) - 3)]) AS shingle_fp
      |FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---- DD1: exact dedup (hash-groupBy) -----------------------------------
  private def dd1ExactDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    Dedup.exactDupGroups(docs, col("doc_id"), col("text"))
      .orderBy(col("content_hash"))
  }

  private val dd1Sql =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  // ---- DD2: MinHash + LSH near-dup pairs ---------------------------------
  // dd2 and dd6 share ONE signature+pair computation per (session, dir):
  // a pipeline running pair detection AND canonicalization must not
  // regenerate the banded pair stage, so the verified pairs are eagerly
  // localCheckpointed and the second consumer starts from materialized
  // blocks. (Same-session reuse only — the checkpoint dies with the
  // session, and so does the cache entry's usefulness.)
  private val minhashPairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), DataFrame]

  // dd6 and dd7 both consume the component assignment; the label
  // propagation runs once per (session, dir), same contract as the
  // pair cache above
  private val componentsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), DataFrame]

  /** Snapshot token for the documents table under `dir`: the max leaf
    * mtime. Part of the cache key, so a same-session rewrite of the
    * data misses the cache instead of silently serving stale
    * checkpointed pairs. Metadata-only (one directory walk).
    */
  private def dirToken(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir, "documents.parquet")
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.mapToLong(f => f.toFile.lastModified).max.orElse(0L)
      finally s.close()
    }
  }

  /** computeIfAbsent plus eviction of entries whose session has been
    * stopped — a long-lived JVM (the test runner spins up one session
    * per suite) must not pin dead sessions' checkpointed plans forever.
    */
  private def cachedPerSession(
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), DataFrame],
      s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val token = dirToken(dir)
    // evict dead sessions AND superseded tokens — a rewrite must not
    // leave the old entry pinning its checkpoint blocks for the rest
    // of the session's life
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped ||
      (k._1 == s && k._2 == dir && k._3 != token))
    cache.computeIfAbsent((s, dir, token), _ => build)
  }

  private def sharedMinhashPairs(s: SparkSession, dir: String): DataFrame =
    cachedPerSession(minhashPairsCache, s, dir) {
      Dedup.minHashNearDupPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", k = 32, bands = 8, threshold = 0.9)
        .localCheckpoint(true)
    }

  private def sharedComponents(s: SparkSession, dir: String): DataFrame =
    cachedPerSession(componentsCache, s, dir) {
      Dedup.minLabelComponents(sharedMinhashPairs(s, dir),
          Tables.load(s, dir, "documents"), "doc_id")
        .localCheckpoint(true)
    }

  private def dd2MinhashPairs(s: SparkSession, dir: String): DataFrame =
    sharedMinhashPairs(s, dir)
      .orderBy(col("id_a"), col("id_b"))

  private val dd2Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT id_a, id_b,
      |    floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
      |  FROM cands JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b)
      |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin

  // ---- DI1: persisted dedup index (incremental build/serve) --------------
  // Incremental dedup's build/serve split: the corpus (every non-src0
  // source) pays signature hashing + one bucketed shuffle at build
  // time; the "new batch" (src0) hashes only itself and probes the
  // stored band rows — the per-ingest dedup-against-reference shape a
  // production pipeline runs every batch. The oracle restates the dd2
  // CTE stack cross-side, so candidates AND verified pairs hash-match
  // through the persisted index.
  private def di1DedupIndex(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val t = graft.sources.DedupIndex.tableFor(dir)
    graft.sources.DedupIndex.build(
      docs.filter(col("source") =!= "src0"), t, "doc_id", "text")
    graft.sources.DedupIndex.probe(
        s, t, docs.filter(col("source") === "src0"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---- DI2: incremental index append (build → append → probe) ------------
  // The production ingest loop: build the index on the older sources,
  // append src1 as a later batch (O(|batch|) hashing + one bucketed
  // append, no corpus re-hash), probe src0. Signatures are
  // per-document, so the appended index is EXACTLY the rebuilt one —
  // di1's oracle certifies it unchanged: any dropped/duplicated append
  // row would shift candidates or pairs.
  private def di2IndexAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val t = s"${graft.sources.DedupIndex.tableFor(dir)}_ap"
    graft.sources.DedupIndex.build(
      docs.filter(col("source") =!= "src0" && col("source") =!= "src1"),
      t, "doc_id", "text")
    graft.sources.DedupIndex.append(
      s, t, docs.filter(col("source") === "src1"), "doc_id", "text")
    graft.sources.DedupIndex.probe(
        s, t, docs.filter(col("source") === "src0"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  private val di1Sql =
    s"""WITH t AS (SELECT doc_id, source, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id, source,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id, source,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key
      |  WHERE a.source <> 'src0' AND b.source = 'src0')
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT id_a, id_b,
      |    floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
      |  FROM cands JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b)
      |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin

  // ---- DD6: near-dup canonicalization (connected components) -------------
  // Assign every doc the min doc_id of its ≥0.9-Jaccard component; the
  // oracle computes the same fixpoint with a recursive CTE.
  private def dd6NeardupCanonical(s: SparkSession, dir: String): DataFrame =
    sharedComponents(s, dir).orderBy(col("doc_id"))

  private val dd6Sql =
    s"""WITH RECURSIVE t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
      |SELECT id AS doc_id, MIN(lbl) AS canonical_id
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  // ---- CC1: alternating-star connected components ------------------------
  // The same canonicalization contract as dd6 computed by a different
  // algorithm class — large-star/small-star edge contraction (O(log n)
  // rounds on ANY graph topology, edge-set state) instead of min-label
  // propagation (O(diameter) rounds, label-table state). Sharing dd6's
  // oracle certifies the two distributed algorithms agree to the hash.
  private def cc1StarComponents(s: SparkSession, dir: String): DataFrame =
    Dedup.alternatingStarComponents(sharedMinhashPairs(s, dir),
        Tables.load(s, dir, "documents"), "doc_id")
      .orderBy(col("doc_id"))

  // ---- PR1: integer-exact PageRank over the near-dup graph ---------------
  // 3 fixed-point iterations of damped PageRank (d=0.85) over the same
  // pair graph dd6 canonicalizes — the "which documents sit at the
  // center of duplication mass" ranking. All arithmetic is integer
  // (millionth ranks, floor-division contributions), so the iterative
  // algorithm is bit-reproducible and the oracle unrolls the identical
  // three iterations as chained CTEs. Top-50 by rank.
  private def pr1PageRank(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.pageRankFixedPoint(sharedMinhashPairs(s, dir), iters = 3)
      .orderBy(col("rank").desc, col("id"))
      .limit(50)
      .select(col("id").as("doc_id"), col("rank"))

  private val pr1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src),
      |pr0 AS (SELECT src AS id, 1000000::BIGINT AS rank FROM deg),
      |pr1 AS (
      |  SELECT d.src AS id, 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS rank
      |  FROM deg d LEFT JOIN (
      |    SELECT e.dst, SUM(p.rank // dg.degree) AS in_sum
      |    FROM pr0 p JOIN deg dg ON p.id = dg.src JOIN edges e ON e.src = p.id
      |    GROUP BY e.dst) x ON x.dst = d.src),
      |pr2 AS (
      |  SELECT d.src AS id, 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS rank
      |  FROM deg d LEFT JOIN (
      |    SELECT e.dst, SUM(p.rank // dg.degree) AS in_sum
      |    FROM pr1 p JOIN deg dg ON p.id = dg.src JOIN edges e ON e.src = p.id
      |    GROUP BY e.dst) x ON x.dst = d.src),
      |pr3 AS (
      |  SELECT d.src AS id, 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS rank
      |  FROM deg d LEFT JOIN (
      |    SELECT e.dst, SUM(p.rank // dg.degree) AS in_sum
      |    FROM pr2 p JOIN deg dg ON p.id = dg.src JOIN edges e ON e.src = p.id
      |    GROUP BY e.dst) x ON x.dst = d.src)
      |SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank
      |FROM pr3 ORDER BY rank DESC, id LIMIT 50""".stripMargin

  // ---- KC1: k-core decomposition over the near-dup graph -----------------
  // Bounded synchronous peel (Graph.kCore): the dense near-clique
  // component survives k = 10 while the sparse tail (degrees 1-7 on
  // this graph at both SFs) cascades away; 3 rounds covers the
  // cascade depth with a converged-fixpoint margin, and the FIXED
  // round count is what lets the oracle unroll the peel as plain CTEs
  // (the pr1 pattern — no recursion, both engines run exactly the
  // same 3 rounds).
  private def kc1KCore(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.kCore(sharedMinhashPairs(s, dir), k = 10, rounds = 3)
      .orderBy(col("core_degree").desc, col("id"))
      .limit(50)
      .select(col("id").as("doc_id"), col("core_degree"))

  private val kc1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |e0 AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |       UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      |v1 AS (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= 10),
      |e1 AS (SELECT e.src, e.dst FROM e0 e
      |       JOIN v1 a ON e.src = a.src JOIN v1 b ON e.dst = b.src),
      |v2 AS (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 10),
      |e2 AS (SELECT e.src, e.dst FROM e1 e
      |       JOIN v2 a ON e.src = a.src JOIN v2 b ON e.dst = b.src),
      |v3 AS (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 10),
      |e3 AS (SELECT e.src, e.dst FROM e2 e
      |       JOIN v3 a ON e.src = a.src JOIN v3 b ON e.dst = b.src)
      |SELECT src AS doc_id, COUNT(*) AS core_degree
      |FROM e3 GROUP BY src HAVING COUNT(*) >= 10
      |ORDER BY core_degree DESC, doc_id LIMIT 50""".stripMargin

  // ---- LP1: label-propagation communities over the near-dup graph --------
  // Deterministic synchronous LPA (Graph.labelPropagation): most
  // frequent neighbor label, ties to the smallest, 3 fixed rounds —
  // the kc1 posture (fixed rounds ⇒ unrolled-CTE oracle, no
  // recursion); on near-clique communities LPA converges in 2-3
  // rounds, so the community sizes are the duplicate-class census.
  private def lp1LabelProp(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.labelPropagation(sharedMinhashPairs(s, dir), rounds = 3)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("label"))
      .limit(50)
      .select(col("label").as("community"), col("n_members"))

  private val lp1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |e0 AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |       UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      |l0 AS (SELECT src AS id, src AS label FROM e0 GROUP BY src),
      |l1 AS (SELECT src AS id, label FROM (
      |  SELECT e.src, l.label,
      |    row_number() OVER (PARTITION BY e.src ORDER BY COUNT(*) DESC, l.label) AS rn
      |  FROM e0 e JOIN l0 l ON e.dst = l.id GROUP BY e.src, l.label) WHERE rn = 1),
      |l2 AS (SELECT src AS id, label FROM (
      |  SELECT e.src, l.label,
      |    row_number() OVER (PARTITION BY e.src ORDER BY COUNT(*) DESC, l.label) AS rn
      |  FROM e0 e JOIN l1 l ON e.dst = l.id GROUP BY e.src, l.label) WHERE rn = 1),
      |l3 AS (SELECT src AS id, label FROM (
      |  SELECT e.src, l.label,
      |    row_number() OVER (PARTITION BY e.src ORDER BY COUNT(*) DESC, l.label) AS rn
      |  FROM e0 e JOIN l2 l ON e.dst = l.id GROUP BY e.src, l.label) WHERE rn = 1)
      |SELECT label AS community, COUNT(*) AS n_members FROM l3
      |GROUP BY 1 ORDER BY n_members DESC, community LIMIT 50""".stripMargin

  // ---- TR1: exact triangle counts over the near-dup graph ----------------
  // Degree-ordered edge orientation (Suri-Vassilvitskii): every
  // triangle counted exactly once at its unique out-degree-2 apex —
  // no DISTINCT, no ÷3, and out-degree bounded O(√m) so the wedge
  // join survives hubs. The query runs on a deterministic 25% edge
  // sample: the raw near-dup graph is near-CLIQUES (sf0.1: ~200-doc
  // classes → tens of millions of triangles — a number derivable in
  // closed form from component sizes, C(c,3), without any join), and
  // triangle counting earns its keep on the sparse remainder, where
  // local density is NOT implied by the component. The sample is
  // hash-deterministic and restated by the oracle.
  private def tr1Triangles(s: SparkSession, dir: String): DataFrame = {
    val sampled = sharedMinhashPairs(s, dir)
      .filter(pmod(graft.ops.Dedup.hash60(
        concat_ws("|", col("id_a"), col("id_b"))), lit(4L)) === 0L)
      .localCheckpoint(true) // feeds the triangle pass AND the degrees
    val deg = sampled.select(col("id_a").as("id"))
      .unionByName(sampled.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // local clustering coefficient = triangles / C(d, 2): the per-node
    // "how clique-like is my neighborhood" companion to the raw count
    // (d ≥ 2 whenever a node has a triangle, so the division is total)
    graft.ops.Graph.triangleCounts(sampled)
      .join(deg, Seq("id"))
      .orderBy(col("n_triangles").desc, col("id"))
      .limit(20)
      .select(col("id").as("doc_id"), col("n_triangles"),
        graft.ops.TextAnalysis.round6(
          col("n_triangles").cast("double") * 2.0 / (col("d") * (col("d") - 1)))
          .as("lcc6"))
  }

  private val tr1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |sampled AS (
      |  SELECT id_a, id_b FROM pairs
      |  WHERE ('0x' || substr(md5(CAST(id_a AS VARCHAR) || '|' || CAST(id_b AS VARCHAR)), 1, 15))::BIGINT % 4 = 0),
      |edges AS (SELECT id_a AS u, id_b AS v FROM sampled
      |          UNION ALL SELECT id_b, id_a FROM sampled),
      |deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
      |ori AS (
      |  SELECT e.u, e.v FROM edges e
      |  JOIN deg a ON a.u = e.u JOIN deg b ON b.u = e.v
      |  WHERE a.d < b.d OR (a.d = b.d AND e.u < e.v)),
      |tri AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM ori e1 JOIN ori e2 ON e1.u = e2.u AND e1.v <> e2.v
      |  JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v),
      |nodes AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
      |          UNION ALL SELECT z FROM tri),
      |tc AS (SELECT id, COUNT(*) AS n_triangles FROM nodes GROUP BY id),
      |nd AS (SELECT u AS id, COUNT(*) AS d FROM edges GROUP BY u)
      |SELECT tc.id AS doc_id, n_triangles,
      |  floor(CAST(n_triangles AS DOUBLE) * 2.0 / (d * (d - 1))
      |        * 1000000.0 + 0.5) / 1000000.0 AS lcc6
      |FROM tc JOIN nd ON nd.id = tc.id
      |ORDER BY n_triangles DESC, doc_id LIMIT 20""".stripMargin

  // ---- PJ1: exact Jaccard-threshold join via prefix filtering ------------
  // AllPairs/PPJoin-style EXACT similarity self-join: df-ordered prefix
  // filtering generates every Jaccard≥0.9 pair with zero false
  // negatives and no O(n²) stage. The oracle is the NAIVE QUADRATIC
  // cross join — tractable for DuckDB at oracle scale, impossible at
  // corpus scale — so a hash match certifies the prefix filter loses
  // nothing: exactness is the tested property, not an assumption.
  // Same 0.9 threshold as dd2, so the two rows together measure exactly
  // what LSH recall costs (dd2 ⊆ pj1 by construction).
  private def pj1PrefixJaccard(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Dedup.prefixJaccardPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", threshold = 0.9),
      col("id_a"), col("id_b"))

  private val pj1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sets AS (
      |  SELECT doc_id, [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh
      |  FROM t)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    floor(CAST(len(list_intersect(a.wh, b.wh)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.wh, b.wh))) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
      |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin

  // ---- DD7: best-of-component canonical selection ------------------------
  // The production "which copy do we keep" policy: instead of dd6's
  // min-id, keep each near-dup component's HIGHEST-QUALITY member
  // (rule-7 pre-rounded score, doc_id tie-break). Composition over the
  // same shared pair stage as dd2/dd6 plus the quality scorer — one
  // extra component-partitioned window after the label propagation.
  private def dd7ComponentBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val comp = sharedComponents(s, dir)
    val q = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    comp.join(q, Seq("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("canonical_id"))
          .orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("canonical_id"), col("doc_id").as("best_id"), col("quality"))
      .orderBy(col("canonical_id"))
  }

  private val dd7Sql =
    s"""WITH RECURSIVE t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id AS doc_id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
      |q AS (
      |  SELECT doc_id,
      |    floor((0.4 * least(1.0, CAST(len(w) AS DOUBLE) / 50.0)
      |        + 0.3 * (floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0)
      |        + 0.2 * least(1.0, (floor(CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0) / 8.0)
      |        + 0.1 * (1.0 - floor(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
      |            / greatest(length(text), 1) * 1000000.0 + 0.5) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
      |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents))
      |SELECT canonical_id, best_id, quality FROM (
      |  SELECT comp.canonical_id, q.doc_id AS best_id, q.quality,
      |    ROW_NUMBER() OVER (PARTITION BY comp.canonical_id
      |      ORDER BY q.quality DESC, q.doc_id) AS rn
      |  FROM comp JOIN q ON comp.doc_id = q.doc_id)
      |WHERE rn = 1 ORDER BY canonical_id""".stripMargin

  // ---- QP1: quality propagation over the near-dup graph ------------------
  // Graph signal smoothing for curation: a document's effective quality
  // is averaged with its near-duplicate neighborhood (a doc surrounded
  // by low-quality copies is suspect even if its own score is high).
  // One step of smoothing = one edge join + one aggregation over the
  // SHARED pair stage; all arithmetic in integer fixed point with
  // integer division, so the smoothed scores are engine-exact.
  private def qp1QualityProp(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val q6 = docs.select(col("doc_id"),
      floor(TextAnalysis.qualityScore(col("text")) * 1000000.0 + 0.5)
        .cast("long").as("q6"))
    val pairs = sharedMinhashPairs(s, dir)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val nbr = edges
      .join(q6.select(col("doc_id").as("src"), col("q6").as("nq6")), Seq("src"))
      .groupBy(col("dst").as("doc_id"))
      .agg(count(lit(1)).as("n_neighbors"), sum(col("nq6")).as("sq6"))
    q6.join(nbr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("q6"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        when(col("n_neighbors").isNull, col("q6"))
          .otherwise(expr("(q6 + (sq6 div n_neighbors)) div 2")).as("smoothed6"))
      .orderBy(col("doc_id"))
  }

  private val qp1Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |q AS (
      |  SELECT doc_id, CAST(floor(
      |    floor((0.4 * least(1.0, CAST(len(w) AS DOUBLE) / 50.0)
      |        + 0.3 * (floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0)
      |        + 0.2 * least(1.0, (floor(CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0) / 8.0)
      |        + 0.1 * (1.0 - floor(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
      |            / greatest(length(text), 1) * 1000000.0 + 0.5) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0
      |    * 1000000.0 + 0.5) AS BIGINT) AS q6
      |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents)),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |nbr AS (
      |  SELECT e.dst AS doc_id, COUNT(*) AS n_neighbors, SUM(q.q6) AS sq6
      |  FROM edges e JOIN q ON q.doc_id = e.src GROUP BY e.dst)
      |SELECT q.doc_id, q.q6,
      |  COALESCE(n.n_neighbors, 0) AS n_neighbors,
      |  CAST(CASE WHEN n.n_neighbors IS NULL THEN q.q6
      |       ELSE (q.q6 + (n.sq6 // n.n_neighbors)) // 2 END AS BIGINT) AS smoothed6
      |FROM q LEFT JOIN nbr n ON n.doc_id = q.doc_id
      |ORDER BY q.doc_id""".stripMargin

  // ---- DD3: SimHash near-dup pairs ---------------------------------------
  private def dd3SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashNearDupPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))

  private val dd3Sql =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS words FROM documents),
      |wh AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
      |       FROM t, unnest(words) AS u(w)),
      |bits AS (
      |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM wh, (SELECT range AS j FROM range(0, 32)) GROUP BY doc_id, j),
      |sh AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS simhash
      |       FROM bits GROUP BY doc_id),
      |chunks AS (
      |  SELECT doc_id, simhash,
      |    unnest([CAST(c AS VARCHAR) || ':' || CAST((simhash >> (c*8)) & 255 AS VARCHAR)
      |            for c in range(0, 4)]) AS chunk_key
      |  FROM sh)
      |SELECT id_a, id_b, hamming FROM (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    bit_count(xor(a.simhash, b.simhash)) AS hamming
      |  FROM chunks a JOIN chunks b ON a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id)
      |WHERE hamming <= 2 ORDER BY id_a, id_b""".stripMargin

  // ---- DD4: n-gram Jaccard dedup (blocked by source+lang) ----------------
  private def dd4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // co-partition by the block key: parallelizes shingle hashing and
    // materializes sh3 into the exchange so the self-join probes read
    // computed arrays instead of re-deriving them per matched pair
    val sh = docs
      .select(col("source"), col("lang"), col("doc_id"),
        graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col("text")), 3).as("sh3"))
      .repartition(col("source"), col("lang"))
    val a = sh.select(col("source"), col("lang"), col("doc_id").as("id_a"), col("sh3").as("sa"))
    val b = sh.select(col("source"), col("lang"), col("doc_id").as("id_b"), col("sh3").as("sb"))
    a.join(b, Seq("source", "lang"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccardSorted(col("sa"), col("sb")).as("jaccard3"))
      .filter(col("jaccard3") >= 0.05)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val dd4Sql =
    """WITH t AS (SELECT doc_id, source, lang, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents),
      |sh AS (SELECT doc_id, source, lang,
      |  [('0x' || substr(md5(s), 1, 15))::BIGINT for s in
      |   list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])] AS sh3
      |  FROM t)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  floor(CAST(len(list_intersect(a.sh3, b.sh3)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.sh3, b.sh3))) * 1000000.0 + 0.5) / 1000000.0 AS jaccard3
      |FROM sh a JOIN sh b
      |  ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE floor(CAST(len(list_intersect(a.sh3, b.sh3)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.sh3, b.sh3))) * 1000000.0 + 0.5) / 1000000.0 >= 0.05
      |ORDER BY id_a, id_b""".stripMargin

  // ---- DD5: embedding-cosine near-dup (blocked by label) -----------------
  private def dd5CosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.load(s, dir, "embeddings"),
        threshold = 0.35, blockCol = "label")
      .orderBy(col("id_a"), col("id_b"))

  private val dd5Sql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  // ---- SIM1: brute-force cosine top-k ------------------------------------
  private def sim1BruteTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim1Sql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings)
      |SELECT query_id, neighbor_id, score, rank FROM (
      |  SELECT query_id, neighbor_id, round(list_dot_product(qe, ce), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY round(list_dot_product(qe, ce), 6) DESC, neighbor_id) AS rank
      |  FROM q JOIN c ON query_id <> neighbor_id)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- SIM7: top-k via bounded aggregation (the no-window rank path) -----
  // Identical results to sim1 (same oracle certifies both), but the
  // per-query rank is a typed bounded-heap AGGREGATOR: partial buffers
  // of ≤ k rows aggregate map-side, so the exchange carries k·partials
  // instead of the full scored candidate set a row_number window sorts
  // — the formulation that survives millions of candidates per query.
  private def sim7AggTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineRounded(col("qe"), col("ce")).as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topKByScore(10)(col("score"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("t"))
      .select(col("query_id"), col("t._1").as("neighbor_id"),
        col("t._2").as("score"), col("t._3").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- SIM2: SRP-LSH bucketed ANN top-k ----------------------------------
  private def sim2LshTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10, planes = 6, dims = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim2Sql =
    """WITH pl AS (
      |  SELECT p, [((('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
      |               % 2001 - 1000) / 1000.0) for i in range(0, 64)] AS w
      |  FROM range(0, 6) t(p)),
      |b AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    SUM(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), w) >= 0
      |             THEN 1 << p ELSE 0 END) AS bucket
      |  FROM embeddings, pl GROUP BY vec_id, embedding)
      |SELECT query_id, neighbor_id, score, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_dot_product(q.e, c.e), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY round(list_dot_product(q.e, c.e), 6) DESC, c.vec_id) AS rank
      |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 5)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- ANN1/ANN2: persisted-index build + serve --------------------------
  // The index-build vs query-serve split: build writes the hashed/
  // assigned corpus as a BUCKETED table (one shuffle, paid once); serve
  // joins the stored partition column. Results are identical to the
  // inline sim2/sim3 computations, so those oracles certify the round
  // trip through the persisted index byte-for-byte.
  private def ann1LshIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val t = graft.sources.AnnIndex.tableFor("lsh", dir)
    graft.sources.AnnIndex.buildLsh(emb, t, planes = 6, dims = 64, buckets = 8)
    graft.sources.AnnIndex.lshServe(s, t, emb.filter(col("vec_id") < 5),
        k = 10, planes = 6, dims = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  private def ann2IvfIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val t = graft.sources.AnnIndex.tableFor("ivf", dir)
    graft.sources.AnnIndex.buildIvf(emb, t, nCentroids = 8, refine = 1, buckets = 8)
    graft.sources.AnnIndex.ivfServe(s, t, emb.filter(col("vec_id") < 5),
        k = 10, nProbe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  // The composed serving index: sim6's oracle certifies the full round
  // trip — stored centroids, stored codebooks, stored lists+codes —
  // because serve touches ONLY those artifacts, never the floats.
  private def ann3IvfPqIndex(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val t = graft.sources.AnnIndex.tableFor("ivfpq", dir)
    graft.sources.AnnIndex.buildIvfPq(emb, t, nCentroids = 8, refine = 1,
      m = 4, dims = 64, codebookK = 16, refinePq = 1, buckets = 8)
    graft.sources.AnnIndex.ivfPqServe(s, t, emb.filter(col("vec_id") < 5),
        k = 10, nProbe = 2, m = 4, dims = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  // The recall-critical stored-index variant: multi-probe serve against
  // the SAME persisted bucketed table ann1 serves single-probe. sim4's
  // oracle certifies it byte-for-byte — probe expansion happens on the
  // query side only, so the stored index needs nothing beyond its
  // single-probe layout.
  private def ann4LshMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val t = graft.sources.AnnIndex.tableFor("lshmp", dir)
    graft.sources.AnnIndex.buildLsh(emb, t, planes = 6, dims = 64, buckets = 8)
    graft.sources.AnnIndex.lshServeMultiProbe(s, t, emb.filter(col("vec_id") < 5),
        k = 10, planes = 6, dims = 64, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- ANN5: centroid-drift signal ---------------------------------------
  // The rebuild-decision input for the no-retrain append contract:
  // build trains on the even vectors, the odd vectors arrive as an
  // ingest batch, and the report compares assignment quality (mean
  // assigned cosine + p10 histogram bin, both from the mergeable
  // fixed-point summary) between the two scopes. The oracle retrains
  // the same centroids (sim3's restatement) and recomputes both
  // distributions from scratch.
  private def ann5IvfDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val t = graft.sources.AnnIndex.tableFor("ivfdrift", dir)
    graft.sources.AnnIndex.buildIvf(emb.filter(col("vec_id") % 2 === 0), t,
      nCentroids = 8, refine = 1, buckets = 8)
    graft.sources.AnnIndex.appendIvf(emb.filter(col("vec_id") % 2 === 1), t)
    graft.sources.AnnIndex.ivfDriftReport(s, t).orderBy(col("scope"))
  }

  private val ann5Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |be AS (SELECT * FROM e WHERE vec_id % 2 = 0),
      |ae AS (SELECT * FROM e WHERE vec_id % 2 = 1),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM be WHERE vec_id < 16),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT b.vec_id, b.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY round(list_dot_product(b.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM be b CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(m ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS m
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |sims AS (
      |  SELECT 'build' AS scope, s FROM (
      |    SELECT b.vec_id, round(list_dot_product(b.emb, c.cent_e), 6) AS s,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY round(list_dot_product(b.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM be b CROSS JOIN cents c) WHERE r = 1
      |  UNION ALL
      |  SELECT 'append' AS scope, s FROM (
      |    SELECT a.vec_id, round(list_dot_product(a.emb, c.cent_e), 6) AS s,
      |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |        ORDER BY round(list_dot_product(a.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM ae a CROSS JOIN cents c) WHERE r = 1),
      |hist AS (
      |  SELECT scope, LEAST(CAST(floor((s + 1.0) * 10) AS INT), 19) AS bin,
      |    COUNT(*) AS cnt,
      |    SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS sum_fp
      |  FROM sims GROUP BY 1, 2),
      |tot AS (
      |  SELECT scope, SUM(cnt) AS n_vectors,
      |    (CAST(SUM(sum_fp) AS DOUBLE) / SUM(cnt)) / 1000000.0 AS mean_sim
      |  FROM hist GROUP BY 1),
      |cum AS (
      |  SELECT scope, bin, SUM(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum
      |  FROM hist),
      |p10 AS (
      |  SELECT c.scope, MIN(c.bin) AS p10_bin
      |  FROM cum c JOIN tot t ON c.scope = t.scope
      |  WHERE c.cum >= t.n_vectors * 0.1 GROUP BY 1)
      |SELECT t.scope, CAST(t.n_vectors AS BIGINT) AS n_vectors, t.mean_sim, p.p10_bin
      |FROM tot t JOIN p10 p ON t.scope = p.scope
      |ORDER BY t.scope""".stripMargin

  // ---- SIM4: multi-probe SRP-LSH ANN top-k -------------------------------
  // Single-probe LSH (sim2) misses true neighbors across a hyperplane;
  // multi-probe also inspects the 2 lowest-|projection| bit-flip
  // buckets per query. The oracle restates probe selection with a
  // ROW_NUMBER over (|projection| asc, plane asc) — identical doubles
  // on both engines because every projection is the same sequential
  // fold sim2 already certifies.
  private def sim4LshMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.lshTopKMultiProbe(emb, emb.filter(col("vec_id") < 5),
        k = 10, planes = 6, dims = 64, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim4Sql =
    """WITH pl AS (
      |  SELECT p, [((('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
      |               % 2001 - 1000) / 1000.0) for i in range(0, 64)] AS w
      |  FROM range(0, 6) t(p)),
      |b AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    SUM(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), w) >= 0
      |             THEN 1 << p ELSE 0 END) AS bucket
      |  FROM embeddings, pl GROUP BY vec_id, embedding),
      |qm AS (
      |  SELECT vec_id, p,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY abs(pr), p) AS r
      |  FROM (SELECT b.vec_id, pl.p, list_dot_product(b.e, pl.w) AS pr
      |        FROM b, pl WHERE b.vec_id < 5)),
      |probes AS (
      |  SELECT vec_id, bucket FROM b WHERE vec_id < 5
      |  UNION ALL
      |  SELECT q.vec_id, xor(b.bucket, 1 << q.p)
      |  FROM qm q JOIN b ON b.vec_id = q.vec_id WHERE q.r <= 2)
      |SELECT query_id, neighbor_id, score, rank FROM (
      |  SELECT qv.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_dot_product(qv.e, c.e), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY qv.vec_id
      |      ORDER BY round(list_dot_product(qv.e, c.e), 6) DESC, c.vec_id) AS rank
      |  FROM probes p
      |  JOIN b qv ON qv.vec_id = p.vec_id
      |  JOIN b c ON c.bucket = p.bucket AND c.vec_id <> qv.vec_id)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- SIM3: IVF-probed ANN top-k ----------------------------------------
  private def sim3IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
        k = 10, nCentroids = 8, nProbe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim3Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e WHERE vec_id < 8),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(m ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS m
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, emb AS ce, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c) WHERE r <= 1),
      |probes AS (
      |  SELECT vec_id AS query_id, emb AS qe, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE r <= 2)
      |SELECT query_id, neighbor_id, score, rank FROM (
      |  SELECT p.query_id, a.neighbor_id,
      |    round(list_dot_product(p.qe, a.ce), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY p.query_id
      |      ORDER BY round(list_dot_product(p.qe, a.ce), 6) DESC, a.neighbor_id) AS rank
      |  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
      |  WHERE p.query_id <> a.neighbor_id)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- EV1: ANN recall evaluation (approx vs exact ground truth) ---------
  // The evaluation harness every ANN deployment needs: recall@10 of the
  // IVF serving path against the brute-force exact top-10, per query.
  // Both sides are deterministic (rounded scores, id tie-breaks), so
  // recall is an exact rational — the oracle restates BOTH retrieval
  // stacks and the set intersection, certifying the measurement itself,
  // not just the retrieval. At scale the exact side runs on a sampled
  // query set (here: the same 5-query probe set every sim query uses)
  // — ground truth is O(|sample|·|corpus|), the one acceptable brute
  // force, while the measured path stays the production IVF plan.
  private def ev1AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteTopK(emb, queries, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.ivfTopK(emb, queries, k = 10, nCentroids = 8, nProbe = 2)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        TextAnalysis.round6(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_exact")).as("recall"))
      .orderBy(col("query_id"))
  }

  private val ev1Sql =
    """WITH bq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |            FROM embeddings WHERE vec_id < 5),
      |bc AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY round(list_dot_product(qe, ce), 6) DESC, neighbor_id) AS rank
      |    FROM bq JOIN bc ON query_id <> neighbor_id)
      |  WHERE rank <= 10),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e WHERE vec_id < 8),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(m ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS m
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, emb AS ce, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c) WHERE r <= 1),
      |probes AS (
      |  SELECT vec_id AS query_id, emb AS qe, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE r <= 2),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT p.query_id, a.neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY p.query_id
      |        ORDER BY round(list_dot_product(p.qe, a.ce), 6) DESC, a.neighbor_id) AS rank
      |    FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
      |    WHERE p.query_id <> a.neighbor_id)
      |  WHERE rank <= 10),
      |hits AS (
      |  SELECT x.query_id, COUNT(*) AS n_hit
      |  FROM exact x JOIN approx a
      |    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
      |  GROUP BY x.query_id)
      |SELECT t.query_id, t.n_exact, COALESCE(h.n_hit, 0) AS n_hit,
      |  floor(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_exact * 1000000.0 + 0.5) / 1000000.0 AS recall
      |FROM (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id) t
      |LEFT JOIN hits h ON t.query_id = h.query_id
      |ORDER BY t.query_id""".stripMargin

  // ---- SD1: SemDeDup — semantic dedup via cluster-blocked cosine ---------
  // Same deterministic k-means as sim3 (seeds = vec_id < K, one
  // fixed-point refine round), then within-cluster near-dup pairs at
  // cosine >= 0.35 drop the higher id. The oracle re-derives the
  // centroids CTE-for-CTE, so a drift in training, assignment
  // tie-breaks, or pair semantics all hash-fail.
  private def sd1SemDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.load(s, dir, "embeddings"),
        nCentroids = 8, refine = 1, threshold = 0.35)
      .orderBy(col("vec_id"))

  private val sd1Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e WHERE vec_id < 8),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(m ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS m
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c) WHERE r <= 1),
      |drops AS (
      |  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
      |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      |  WHERE round(list_dot_product(a.emb, b.emb), 6) >= 0.35)
      |SELECT vec_id, cent_id FROM assigned
      |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
      |ORDER BY vec_id""".stripMargin

  // ---- SIM5: product-quantization ADC top-k ------------------------------
  // PQ = the compression scale path: 4 subspace codes of 16 centroids
  // replace the 64-float vector; queries score through a lookup table.
  // Codebooks are TRAINED: seeds + one fixed-point k-means update pass
  // per subspace (empty clusters keep their seed). The oracle rebuilds
  // codebooks/codes/LUT with the same quantization, so codes AND ranks
  // hash-match.
  private def sim5PqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
        k = 10, m = 4, dims = 64, codebookK = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  /** The PQ CTE stack (shared verbatim by sim5 and sim6): seed
    * codebooks → one k-means pass → trained `cb` → codes + LUT.
    */
  private val pqCtes =
    """j AS (SELECT range AS sub_id FROM range(0, 4)),
      |cb0 AS (
      |  SELECT j.sub_id, e.vec_id AS cent_id,
      |    emb[j.sub_id*16+1 : j.sub_id*16+16] AS cs
      |  FROM e, j WHERE e.vec_id < 16),
      |subs AS (
      |  SELECT e.vec_id, j.sub_id, emb[j.sub_id*16+1 : j.sub_id*16+16] AS v
      |  FROM e, j),
      |asg AS (
      |  SELECT sub_id, cent_id, v FROM (
      |    SELECT s.sub_id, c.cent_id, s.v,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
      |        ORDER BY CAST(floor(list_dot_product(s.v, c.cs) * 1000000.0 + 0.5) AS BIGINT) DESC,
      |                 c.cent_id) AS rn
      |    FROM subs s JOIN cb0 c ON s.sub_id = c.sub_id) WHERE rn = 1),
      |upd AS (
      |  SELECT sub_id, cent_id, list(mv ORDER BY pos) AS cs_new FROM (
      |    SELECT sub_id, cent_id, pos,
      |      (CAST(SUM(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS mv
      |    FROM (SELECT sub_id, cent_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x
      |          FROM asg)
      |    GROUP BY sub_id, cent_id, pos)
      |  GROUP BY sub_id, cent_id),
      |cb AS (
      |  SELECT c.sub_id, c.cent_id, COALESCE(u.cs_new, c.cs) AS cs
      |  FROM cb0 c LEFT JOIN upd u ON c.sub_id = u.sub_id AND c.cent_id = u.cent_id),
      |enc AS (
      |  SELECT vec_id AS neighbor_id, sub_id, cent_id AS code FROM (
      |    SELECT s.vec_id, s.sub_id, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
      |        ORDER BY CAST(floor(list_dot_product(s.v, c.cs) * 1000000.0 + 0.5) AS BIGINT) DESC,
      |                 c.cent_id) AS rn
      |    FROM subs s JOIN cb c ON s.sub_id = c.sub_id) WHERE rn = 1),
      |lut AS (
      |  SELECT s.vec_id AS query_id, s.sub_id, c.cent_id AS code,
      |    CAST(floor(list_dot_product(s.v, c.cs) * 1000000.0 + 0.5) AS BIGINT) AS q6
      |  FROM subs s JOIN cb c ON s.sub_id = c.sub_id WHERE s.vec_id < 5)""".stripMargin

  private val sim5Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |$pqCtes,
      |sc AS (
      |  SELECT query_id, neighbor_id, CAST(SUM(q6) AS BIGINT) AS score6
      |  FROM enc JOIN lut USING (sub_id, code)
      |  WHERE query_id <> neighbor_id
      |  GROUP BY query_id, neighbor_id)
      |SELECT query_id, neighbor_id, score6, rank FROM (
      |  SELECT query_id, neighbor_id, score6,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score6 DESC, neighbor_id) AS rank
      |  FROM sc) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- SIM6: IVF×PQ composed ANN -----------------------------------------
  // The 100 TB serving shape: IVF list pruning (sim3's centroid stack)
  // selects candidates, PQ ADC (sim5's trained-codebook stack) scores
  // them through m-byte codes — float vectors touched only at
  // index-build time. The oracle restates BOTH stacks and the composed
  // join, so candidates, scores and ranks hash-match.
  private def sim6IvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
        k = 10, nCentroids = 8, nProbe = 2, m = 4, dims = 64, codebookK = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  private val sim6Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e WHERE vec_id < 8),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e.vec_id, e.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(m ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS m
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, cent_id FROM (
      |    SELECT e.vec_id, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c) WHERE r <= 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cent_id FROM (
      |    SELECT e.vec_id, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_dot_product(e.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e CROSS JOIN cents c WHERE e.vec_id < 5) WHERE r <= 2),
      |$pqCtes,
      |cand AS (
      |  SELECT p.query_id, a.neighbor_id
      |  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
      |  WHERE p.query_id <> a.neighbor_id),
      |sc AS (
      |  SELECT c.query_id, c.neighbor_id, CAST(SUM(l.q6) AS BIGINT) AS score6
      |  FROM cand c
      |  JOIN enc n ON n.neighbor_id = c.neighbor_id
      |  JOIN lut l ON l.query_id = c.query_id AND l.sub_id = n.sub_id AND l.code = n.code
      |  GROUP BY c.query_id, c.neighbor_id)
      |SELECT query_id, neighbor_id, score6, rank FROM (
      |  SELECT query_id, neighbor_id, score6,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score6 DESC, neighbor_id) AS rank
      |  FROM sc) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- TX4: regex / BPE-ish tokenization ---------------------------------
  private def tx4RegexTokens(s: SparkSession, dir: String): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))
    Ranking.orderByOnce(
      Ranking.spread(Tables.load(s, dir, "documents"), col("doc_id")).select(
        col("doc_id"),
        size(toks).as("n_word_tokens"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).as("n_punct_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / 4.0).cast("long"))
          .as("n_bpe4_pieces")),
      col("doc_id"))
  }

  private val tx4Sql =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
      |  len(regexp_extract_all(text, '[^a-z0-9\s]')) AS n_punct_tokens,
      |  CAST(list_sum([CAST(ceil(length(t) / 4.0) AS BIGINT)
      |                 for t in regexp_extract_all(text, '[a-z0-9]+')]) AS BIGINT) AS n_bpe4_pieces
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- DD8: cross-document duplicated-span coverage ----------------------
  // Substring-level dedup signal (Lee et al. 2021, approximated at
  // 8-gram granularity): per doc, how many token positions sit inside
  // an 8-gram that also occurs in >=2 distinct documents. The coverage
  // is an interval merge of the duplicated grams' [pos, pos+8) windows,
  // so a long duplicated span counts its length once, not once per gram.
  private def dd8DupSpans(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Dedup.dupSpanCoverage(Tables.load(s, dir, "documents"), "doc_id", "text",
        n = 8, minDocs = 2),
      col("doc_id"))

  private val dd8Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents),
      |p AS (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS pos FROM t),
      |g AS (SELECT doc_id, pos,
      |        ('0x' || substr(md5(array_to_string(w[pos:pos+7], ' ')), 1, 15))::BIGINT AS g
      |      FROM p),
      |dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |dp AS (SELECT doc_id, pos FROM g WHERE g IN (SELECT g FROM dup)),
      |m AS (SELECT doc_id, pos,
      |        MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |      FROM dp),
      |c AS (SELECT doc_id, COUNT(*) AS n_dup_grams,
      |        SUM(GREATEST(0, pos + 8 - GREATEST(pos, COALESCE(prev_end, pos)))) AS dup_tokens
      |      FROM m GROUP BY doc_id),
      |nt AS (SELECT doc_id, len(w) AS n_tokens FROM t)
      |SELECT doc_id, n_tokens,
      |  COALESCE(n_dup_grams, 0) AS n_dup_grams,
      |  CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
      |  floor(CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / n_tokens * 1000000.0 + 0.5)
      |    / 1000000.0 AS dup_frac
      |FROM nt LEFT JOIN c USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- LD1: line-level corpus dedup (CCNet/RefinedWeb line-wise pass) ----
  // The test corpus is single-line, so the query PLANTS line structure
  // the same way uc1 plants decomposed characters: both engines derive
  // the identical multi-line corpus (every " table " becomes a newline —
  // replace() is left-to-right non-overlapping in both), then drop lines
  // shared by >=2 distinct docs and reassemble the survivors in order.
  private def ld1LineDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), " table ", "\n").as("text"))
    Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2)
      .orderBy(col("doc_id"))
  }

  private val ld1Sql =
    """WITH d AS (SELECT doc_id,
      |             string_split(replace(text, ' table ', chr(10)), chr(10)) AS w
      |           FROM documents),
      |p AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM d),
      |l AS (SELECT doc_id, pos, w[pos] AS line FROM p),
      |dup AS (SELECT line FROM l GROUP BY line
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |j AS (SELECT l.doc_id, l.pos, l.line, dup.line IS NOT NULL AS isdup
      |      FROM l LEFT JOIN dup USING (line))
      |SELECT doc_id, COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  COALESCE(string_agg(CASE WHEN NOT isdup THEN line END, chr(10)
      |                      ORDER BY pos), '') AS clean_text
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- DC1: train/eval decontamination (n-gram containment) --------------
  // src0 plays the eval set; every other source is training data. The
  // inverted-index join finds eval docs whose 3-gram sets sit ≥50%
  // inside some training doc — the overlap a decontamination pass must
  // remove before training.
  private def dc1Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    Dedup.ngramContainmentPairs(
        docs.filter(col("source") =!= "src0"), docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, threshold = 0.5, maxDf = 1000)
      .orderBy(col("eval_id"), col("train_id"))
  }

  private val dc1Sql =
    """WITH t AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
      |           FROM documents),
      |sh AS (SELECT doc_id, source,
      |  [('0x' || substr(md5(s), 1, 15))::BIGINT for s in
      |   list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])] AS hs
      |  FROM t),
      |tr AS (SELECT doc_id AS train_id, unnest(hs) AS h FROM sh WHERE source <> 'src0'),
      |keep AS (SELECT h FROM tr GROUP BY h HAVING COUNT(*) <= 1000),
      |ev AS (SELECT doc_id AS eval_id, unnest(hs) AS h FROM sh WHERE source = 'src0'),
      |evn AS (SELECT doc_id AS eval_id, len(hs) AS n_eval FROM sh WHERE source = 'src0'),
      |hits AS (
      |  SELECT eval_id, train_id, COUNT(*) AS n_common
      |  FROM ev JOIN tr USING (h)
      |  WHERE h IN (SELECT h FROM keep)
      |  GROUP BY eval_id, train_id)
      |SELECT eval_id, train_id,
      |  floor(CAST(n_common AS DOUBLE) / n_eval * 1000000.0 + 0.5) / 1000000.0 AS containment
      |FROM hits JOIN evn USING (eval_id)
      |WHERE floor(CAST(n_common AS DOUBLE) / n_eval * 1000000.0 + 0.5) / 1000000.0 >= 0.5
      |ORDER BY eval_id, train_id""".stripMargin

  // ---- PK1: sequence packing into 2048-token windows ---------------------
  private def pk1SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    graft.ops.Packing.packWindows(docs, "doc_id", "n_tokens",
        budget = 2048, partitionCol = "lang")
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy(col("lang"), col("pack_id"))
  }

  private val pk1Sql =
    """WITH t AS (SELECT doc_id, lang,
      |             len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      |SELECT lang, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |FROM c GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin

  // ---- PK2: harmonic shelf packing ----------------------------------------
  // pk1's streaming pack can overflow a window by one document; shelf
  // packing never overflows: capacity class k = ⌊budget/len⌋ holds k
  // items per bin by construction (each ≤ budget/k), every full bin is
  // > k/(k+1) ≥ ½ full, and the per-class rank is the distributed
  // grouped zipWithIndex (no single-task window under a dominant
  // class). Budget 128 puts the 10-99-token docs in classes 1-12.
  private def pk2ShelfPacking(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("wc"))
    graft.ops.Packing.shelfPack(docs, "doc_id", "wc", budget = 128)
      .groupBy(col("cap_class"), col("bin_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("bin_tokens"))
      .orderBy(col("cap_class"), col("bin_idx"))
  }

  private val pk2Sql =
    """WITH t AS (SELECT doc_id,
      |             len(string_split_regex(trim(text), '\s+')) AS wc
      |           FROM documents),
      |c AS (SELECT doc_id, wc, 128 // wc AS cap_class FROM t),
      |r AS (SELECT doc_id, wc, cap_class,
      |        ROW_NUMBER() OVER (PARTITION BY cap_class
      |                           ORDER BY wc, doc_id) AS rn FROM c)
      |SELECT CAST(cap_class AS BIGINT) AS cap_class,
      |  CAST(CASE WHEN cap_class > 0 THEN (rn - 1) // cap_class
      |            ELSE rn - 1 END AS BIGINT) AS bin_idx,
      |  COUNT(*) AS n_docs, CAST(SUM(wc) AS BIGINT) AS bin_tokens
      |FROM r GROUP BY 1, 2 ORDER BY cap_class, bin_idx""".stripMargin

  // ---- SM1: deterministic hash sampling (stratified by lang) -------------
  // Reservoir/rand() sampling is irreproducible across engines and
  // re-runs; hash-mod sampling is the pipeline-grade equivalent: the
  // same ~10% of docs selected on every engine, every run.
  private def sm1HashSample(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(pmod(Dedup.hash32(
          concat(lit("sample|"), col("doc_id").cast("string"))), lit(100)) < 10, 1))
          .as("n_sampled"))
      .orderBy(col("lang"))

  private val sm1Sql =
    """SELECT lang, COUNT(*) AS n_total,
      |  COUNT(CASE WHEN ('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
      |        THEN 1 END) AS n_sampled
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- WS1: deterministic weighted sampling ------------------------------
  // Importance sampling by document length: p(keep) = min(1,
  // n_chars·2000/10⁶), decided by the doc-id hash — per-row
  // probabilities where sm1 has per-group rates. The verification
  // aggregates kept-count and kept-mass per source so the oracle row
  // set stays small while every per-row keep decision feeds it.
  private def ws1WeightedSample(s: SparkSession, dir: String): DataFrame =
    Stats.weightedHashSample(Tables.load(s, dir, "documents"),
        "doc_id", "n_chars", scale = 2000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      .orderBy(col("source"))

  private val ws1Sql =
    """SELECT source, COUNT(*) AS n_kept,
      |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      |FROM documents
      |WHERE ('0x' || substr(md5('wsamp|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
      |      < least(n_chars * 2000, 1000000)
      |GROUP BY source ORDER BY source""".stripMargin

  // ---- SP1: stratified exact-N sampling ----------------------------------
  // Exactly 5 docs per language, selected by deterministic hash rank —
  // the "equal representation" sampling mode (vs sm1's rate-based
  // thinning): reproducible on any engine, any run, and exact-N even
  // for skewed strata. One shuffle on the stratum; same plan shape as
  // qc1's per-source cap but ranked by hash, not quality.
  private def sp1StratifiedExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashRank = pmod(Dedup.hash32(
      concat(lit("strat|"), col("doc_id").cast("string"))), lit(1000000007L))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), hashRank.as("hr"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("hr"), col("doc_id"))))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn").cast("long").as("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  private val sp1Sql =
    """SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id FROM (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |               % 1000000007, doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin

  // ---- MX1: corpus mixture reweighting -----------------------------------
  // Data-mixing: deterministically downsample sources to target rates
  // (src0 keeps 100%, src1 80%, src2 50%, src3 20%, rest 10%) — the
  // same rows survive on any engine, any re-run.
  private val mixRates = Map("src0" -> 100, "src1" -> 80, "src2" -> 50, "src3" -> 20)

  private def mx1Mixture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val kept = Stats.mixtureSample(docs, "source", "doc_id", mixRates, defaultRate = 10)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  private val mx1Sql =
    """SELECT source, COUNT(*) AS n_total,
      |  CAST(COUNT(CASE WHEN ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      |                  < (CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 80
      |                                 WHEN 'src2' THEN 50 WHEN 'src3' THEN 20 ELSE 10 END)
      |             THEN 1 END) AS BIGINT) AS n_kept
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- MV1: incremental aggregate maintenance ----------------------------
  // The materialized-view side of CDC: per-status count/total states
  // built from a BASE slice and a DELTA slice separately, then merged —
  // the oracle recomputes the aggregate over the full table, certifying
  // state(base)⊕state(delta) == state(all). At 100 TB the refresh
  // aggregates only the ingest batch and merges O(|keys|) state rows.
  private def mv1IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val cut = "1997-01-01"
    val base = Incremental.aggState(
      orders.filter(col("o_orderdate") < lit(cut)), Seq("o_orderstatus"), "o_totalprice")
    val delta = Incremental.aggState(
      orders.filter(col("o_orderdate") >= lit(cut)), Seq("o_orderstatus"), "o_totalprice")
    Incremental.finish(
        Incremental.merge(Seq("o_orderstatus"), base, delta), Seq("o_orderstatus"))
      .orderBy(col("o_orderstatus"))
  }

  private val mv1Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
      |  floor(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*) / 100 * 1000000.0 + 0.5) / 1000000.0 AS mean_value
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- MV2: retraction-maintained aggregate ------------------------------
  // The delete path of matview maintenance, oracle-certified: start
  // from the full-table state, feed every 'F'-status order back as a
  // RETRACTION (sign −1), and the maintained state must equal a direct
  // recompute over the surviving (non-F) rows — including 'F' vanishing
  // entirely (count reaches zero ⇒ key drops out).
  private def mv2Retraction(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders")
    val base = Incremental.aggState(orders, Seq("o_orderstatus"), "o_totalprice")
    val retractions = Incremental.aggState(
      orders.filter(col("o_orderstatus") === "F").withColumn("__sign", lit(-1L)),
      Seq("o_orderstatus"), "o_totalprice", signCol = Some("__sign"))
    Incremental.finish(
        Incremental.merge(Seq("o_orderstatus"), base, retractions), Seq("o_orderstatus"))
      .orderBy(col("o_orderstatus"))
  }

  private val mv2Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
      |  floor(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*) / 100 * 1000000.0 + 0.5) / 1000000.0 AS mean_value
      |FROM orders WHERE o_orderstatus <> 'F'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- MX2: temperature-based mixture reweighting ------------------------
  // mx1 applies GIVEN per-source rates; this COMPUTES them: weight_s ∝
  // √n_s (α = 0.5 temperature mixing — the flattening step before a
  // training run). √n quantizes to fixed point before the cross-source
  // sum, so the normalizer is an order-independent integer.
  private def mx2Temperature(s: SparkSession, dir: String): DataFrame =
    Stats.temperatureWeights(Tables.load(s, dir, "documents"), "source")
      .orderBy(col("source"))

  private val mx2Sql =
    """WITH c AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(floor(sqrt(COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs,
      |  floor(q / (SELECT CAST(SUM(q) AS DOUBLE) FROM c) * 1000000.0 + 0.5) / 1000000.0 AS weight6
      |FROM c ORDER BY source""".stripMargin

  // ---- MX3: the temperature mixture, materialized --------------------------
  // mx2 computes the √n weights; this SHIPS the mixture: per-source
  // deterministic hash-Bernoulli downsampling at rate √(n_min/n_s), so
  // each source lands E[n'] = √(n·n_min) ∝ √n rows. Keep/drop is the
  // md5-prefix doc hash — both engines decide every row identically,
  // so the per-source sampled counts hash-match exactly.
  private def mx3TemperatureSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val sampled = graft.ops.Stats.temperatureSample(docs, "source", "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  private val mx3Sql =
    """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |m AS (SELECT MIN(n_docs) AS n_min FROM c),
      |r AS (SELECT source,
      |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) * 1000000.0 + 0.5) AS BIGINT) AS rate6
      |  FROM c, m),
      |k AS (SELECT d.source, COUNT(*) AS n_sampled
      |      FROM documents d JOIN r ON d.source = r.source
      |      WHERE ('0x' || substr(md5('mix3|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |        % 1000000 < r.rate6
      |      GROUP BY d.source)
      |SELECT c.source, c.n_docs, CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled
      |FROM c LEFT JOIN k ON c.source = k.source ORDER BY c.source""".stripMargin

  // ---- IM1: weighted source interleaving ----------------------------------
  // mx2 computes the temperature weights; this MATERIALIZES the
  // training order that realizes them: start-time fair queueing's
  // vt = rank/w schedule, so every prefix of the vt order holds
  // sources in proportion to √n (checked on the first 300 rows). The
  // per-source rank is the distributed grouped rank (no single-task
  // window under a dominant source).
  private def im1Interleave(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val w = docs.groupBy(col("source")).agg(
      floor(sqrt(count(lit(1)).cast("double")) * 1000000.0 + 0.5)
        .cast("long").as("w6"))
    graft.ops.Packing.interleaveByWeight(
        docs.select(col("doc_id"), col("source")), "source",
        Seq(col("doc_id")), w)
      .orderBy(col("vt"), col("source"), col("src_rank"))
      .limit(300)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_prefix"))
      .orderBy(col("source"))
  }

  private val im1Sql =
    """WITH w AS (
      |  SELECT source, CAST(floor(sqrt(COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS w6
      |  FROM documents GROUP BY 1),
      |r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      |  FROM documents),
      |v AS (
      |  SELECT r.source, r.rk, CAST(r.rk AS DOUBLE) * 1000000.0 / w.w6 AS vt
      |  FROM r JOIN w USING (source)),
      |p AS (SELECT source FROM v ORDER BY vt, source, rk LIMIT 300)
      |SELECT source, COUNT(*) AS n_prefix FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- HN1: hard-negative mining ------------------------------------------
  // The DPR/SimCSE contrastive-training data-prep step: per query, the
  // top-10 most similar corpus vectors with a DIFFERENT label —
  // boundary-hugging negatives. sim7's bounded-heap rank shape under
  // the label filter.
  private def hn1HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  private val hn1Sql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe, label AS ql
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce, label AS nl
      |      FROM embeddings)
      |SELECT query_id, neighbor_id, score, rank FROM (
      |  SELECT query_id, neighbor_id, round(list_dot_product(qe, ce), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY round(list_dot_product(qe, ce), 6) DESC, neighbor_id) AS rank
      |  FROM q JOIN c ON ql <> nl)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- CP1: end-to-end curation pipeline (composition proof) -------------
  // The whole corpus-prep chain as ONE dataflow: exact dedup → token
  // quality gate → per-source mixture downsampling → (source, lang)
  // rollup. Every stage is an existing operator
  // (Dedup.exactDedup / TextAnalysis.tokens / Stats.mixtureSample) and
  // the oracle restates each stage independently — the proof that the
  // operators COMPOSE, which is how a real pipeline consumes them.
  // Plan: dedup's semi-join shuffle + one map-side filter chain + one
  // rollup shuffle; the quality gate and sampling add no exchanges.
  private def cp1Curation(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val deduped = Dedup.exactDedup(docs, "doc_id", "text")
    val quality = deduped.filter(size(TextAnalysis.tokens(col("text"))) >= 20)
    val sampled = Stats.mixtureSample(quality, "source", "doc_id",
      mixRates, defaultRate = 10)
    sampled.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy(col("source"), col("lang"))
  }

  private val cp1Sql =
    """WITH keep AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents
      |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
      |q AS (
      |  SELECT d.doc_id, d.source, d.lang,
      |    len(string_split_regex(trim(d.text), '\s+')) AS n_tok
      |  FROM documents d JOIN keep USING (doc_id)
      |  WHERE len(string_split_regex(trim(d.text), '\s+')) >= 20),
      |s AS (
      |  SELECT * FROM q
      |  WHERE ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      |        < (CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 80
      |                       WHEN 'src2' THEN 50 WHEN 'src3' THEN 20 ELSE 10 END))
      |SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM s GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // ---- CP2: the full dedup ladder as ONE curation run --------------------
  // Every tier a production curation pass runs, composed in pipeline
  // order over the same corpus — exact (content hash) → near (MinHash-
  // banded, lower-id survivor) → substring (dd8's duplicated-span
  // coverage as a gate at 0.3) → semantic (SemDeDup over the survivors'
  // embeddings) — emitting per-tier (n_in, n_rejected, n_out). The
  // tiers reuse the exact operators dd1/dd2/dd8/sd1 verify in
  // isolation; this row is the cross-tier interface canary (a survivor-
  // set drift in ANY tier shifts every later count). Scale shape: each
  // tier keeps its own one-shuffle plan; the composition adds only
  // semi/anti joins on doc_id, and the five tier cardinalities
  // materialize in one pass (the 1-row checkpoint) so the 4-row output
  // doesn't re-run the ladder per row.
  private def cp2FullLadder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // Each tier's survivor set is eagerly checkpointed as a SLIM id
    // frame (doc_id only — never document text) before the next tier
    // builds on it: the five count branches below share one frame per
    // tier instead of re-deriving every earlier tier per branch (the
    // unmaterialized form re-ran the exact tier ~4x and the span tier
    // 2x — measured 8.2 s warm vs 2.6 s checkpointed at sf0.1). This
    // is the decide-with-small-rows shape: what persists between tiers
    // is O(ids), the corpus is scanned per tier but never shuffled.
    val s1 = Dedup.exactDedup(docs, "doc_id", "text").select(col("doc_id"))
      .localCheckpoint(true)
    // near tier: drop any tier-1 survivor that MinHash-verifies (>=0.9
    // Jaccard) against a lower-id survivor — the greedy lower-id-wins
    // policy (dd6's full component closure is the *canonicalization*
    // variant; a reject gate needs no transitivity)
    val pairs = sharedMinhashPairs(s, dir)
    val rej2 = pairs
      .join(s1.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
      .join(s1.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_b").as("doc_id")).distinct()
    val s2 = s1.join(rej2, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // substring tier: coverage is computed over the FULL corpus (the
    // signal is "how much of this doc exists elsewhere", which earlier
    // rejections don't change), then applied as a gate to survivors
    val cov = Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 8, minDocs = 2)
      .select(col("doc_id"), col("dup_frac"))
    val s3 = s2.join(cov, Seq("doc_id")).filter(col("dup_frac") <= 0.3)
      .select(col("doc_id"))
      .localCheckpoint(true)
    // semantic tier: SemDeDup over the surviving docs' embeddings
    // (vec_id is doc-aligned); seeds re-derive from the survivor set
    val emb3 = Tables.load(s, dir, "embeddings")
      .join(s3.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val s4 = Similarity.semDedup(emb3, nCentroids = 8, refine = 1, threshold = 0.35)
      .select(col("vec_id"))
    def cnt(df: DataFrame, name: String) = df.agg(count(lit(1)).as(name))
    val all = cnt(docs, "c0").crossJoin(cnt(s1, "c1")).crossJoin(cnt(s2, "c2"))
      .crossJoin(cnt(s3, "c3")).crossJoin(cnt(s4, "c4"))
      .localCheckpoint(true) // one ladder run feeds all four rows
    def row(tier: String, nin: org.apache.spark.sql.Column,
        nout: org.apache.spark.sql.Column) =
      all.select(lit(tier).as("tier"), nin.as("n_in"),
        (nin - nout).as("n_rejected"), nout.as("n_out"))
    row("1_exact", col("c0"), col("c1"))
      .unionByName(row("2_minhash", col("c1"), col("c2")))
      .unionByName(row("3_spans", col("c2"), col("c3")))
      .unionByName(row("4_semantic", col("c3"), col("c4")))
      .orderBy(col("tier"))
  }

  private val cp2Sql =
    """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS words FROM documents),
      |keep AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents
      |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
      |sigs AS (
      |  SELECT doc_id,
      |    [('0x' || substr(md5(w), 1, 15))::BIGINT for w in words] AS wh,
      |    [list_min([((('0x' || substr(md5('a' || chr(124) || CAST(i AS VARCHAR)), 1, 5))::BIGINT | 1)
      |                 * ('0x' || substr(md5(w), 1, 8))::BIGINT
      |                 + ('0x' || substr(md5('b' || chr(124) || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 4294967291
      |                ) % 4294967291
      |               for w in words]) for i in range(0, 32)] AS sig
      |  FROM t),
      |bands AS (
      |  SELECT doc_id,
      |    unnest([('0x' || substr(md5(CAST(b AS VARCHAR) || '|' || array_to_string(sig[b*4+1:b*4+4], '|')), 1, 15))::BIGINT
      |            for b in range(0, 8)]) AS band_key
      |  FROM sigs),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cands
      |  JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b
      |  WHERE floor(CAST(len(list_intersect(sa.wh, sb.wh)) AS DOUBLE)
      |      / len(list_distinct(list_concat(sa.wh, sb.wh))) * 1000000.0 + 0.5) / 1000000.0 >= 0.9),
      |rej2 AS (
      |  SELECT DISTINCT id_b AS doc_id FROM pairs
      |  WHERE id_a IN (SELECT doc_id FROM keep) AND id_b IN (SELECT doc_id FROM keep)),
      |s2 AS (SELECT doc_id FROM keep WHERE doc_id NOT IN (SELECT doc_id FROM rej2)),
      |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |p AS (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS pos FROM tw),
      |g AS (SELECT doc_id, pos,
      |        ('0x' || substr(md5(array_to_string(w[pos:pos+7], ' ')), 1, 15))::BIGINT AS g
      |      FROM p),
      |dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |dp AS (SELECT doc_id, pos FROM g WHERE g IN (SELECT g FROM dup)),
      |m AS (SELECT doc_id, pos,
      |        MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |      FROM dp),
      |c AS (SELECT doc_id,
      |        SUM(GREATEST(0, pos + 8 - GREATEST(pos, COALESCE(prev_end, pos)))) AS dup_tokens
      |      FROM m GROUP BY doc_id),
      |cov AS (SELECT nt.doc_id,
      |        floor(CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / len(w) * 1000000.0 + 0.5)
      |          / 1000000.0 AS dup_frac
      |      FROM tw nt LEFT JOIN c USING (doc_id)),
      |rej3 AS (SELECT doc_id FROM s2 JOIN cov USING (doc_id) WHERE dup_frac > 0.3),
      |s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM rej3)),
      |e3 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |       WHERE vec_id IN (SELECT doc_id FROM s3)),
      |seeds AS (SELECT vec_id AS cent_id, emb AS cent_e FROM e3 ORDER BY vec_id LIMIT 8),
      |seed_assign AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e3.vec_id, e3.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e3.vec_id
      |        ORDER BY round(list_dot_product(e3.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e3 CROSS JOIN seeds c) WHERE r <= 1),
      |cents AS (
      |  SELECT cent_id, list(mm ORDER BY pos) AS cent_e FROM (
      |    SELECT cent_id, pos,
      |      (CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / COUNT(*)) / 1000000.0 AS mm
      |    FROM (SELECT cent_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
      |          FROM seed_assign)
      |    GROUP BY cent_id, pos)
      |  GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id, emb, cent_id FROM (
      |    SELECT e3.vec_id, e3.emb, c.cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY e3.vec_id
      |        ORDER BY round(list_dot_product(e3.emb, c.cent_e), 6) DESC, c.cent_id) AS r
      |    FROM e3 CROSS JOIN cents c) WHERE r <= 1),
      |drops AS (
      |  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
      |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      |  WHERE round(list_dot_product(a.emb, b.emb), 6) >= 0.35),
      |s4 AS (SELECT vec_id FROM assigned WHERE vec_id NOT IN (SELECT vec_id FROM drops)),
      |counts AS (SELECT
      |  (SELECT COUNT(*) FROM documents) AS c0,
      |  (SELECT COUNT(*) FROM keep) AS c1,
      |  (SELECT COUNT(*) FROM s2) AS c2,
      |  (SELECT COUNT(*) FROM s3) AS c3,
      |  (SELECT COUNT(*) FROM s4) AS c4)
      |SELECT tier, n_in, n_rejected, n_out FROM (
      |  SELECT '1_exact' AS tier, c0 AS n_in, c0 - c1 AS n_rejected, c1 AS n_out FROM counts
      |  UNION ALL SELECT '2_minhash', c1, c1 - c2, c2 FROM counts
      |  UNION ALL SELECT '3_spans', c2, c2 - c3, c3 FROM counts
      |  UNION ALL SELECT '4_semantic', c3, c3 - c4, c4 FROM counts)
      |ORDER BY tier""".stripMargin

  // ---- QC1: per-source quality cap (best-N docs per domain) --------------
  // The "cap each domain's contribution, keeping its best documents"
  // quality gate: rank by the (pre-rounded, rule-7) quality score with a
  // doc_id tie-break, keep 10 per source. One shuffle on source; ranks
  // are deterministic across engines because the score is rounded
  // BEFORE ranking.
  private def qc1SourceCap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("rn") <= 10)
      .select(col("source"), col("rn"), col("doc_id"), col("quality"))
      .orderBy(col("source"), col("rn"))

  private val qc1Sql =
    """WITH q AS (
      |  SELECT doc_id, source,
      |    floor((0.4 * least(1.0, CAST(len(w) AS DOUBLE) / 50.0)
      |        + 0.3 * (floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0)
      |        + 0.2 * least(1.0, (floor(CAST(list_sum([length(x) for x in w]) AS DOUBLE) / len(w) * 1000000.0 + 0.5) / 1000000.0) / 8.0)
      |        + 0.1 * (1.0 - floor(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
      |            / greatest(length(text), 1) * 1000000.0 + 0.5) / 1000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
      |  FROM (SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') AS w FROM documents))
      |SELECT source, rn, doc_id, quality FROM (
      |  SELECT source, doc_id, quality,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn
      |  FROM q)
      |WHERE rn <= 10 ORDER BY source, rn""".stripMargin

  // ---- EMB1: per-label centroid update (one k-means step) ----------------
  // Element-wise mean over the embedding column: posexplode → (label,
  // dim) average. The classic shuffle-by-(label,dim) vector aggregation
  // a clustering pipeline runs every iteration; partial aggregation
  // means the shuffle carries |labels|·dims rows, not |corpus|·dims.
  private def emb1LabelCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v").cast("double")), 6).as("centroid_v"),
        count(lit(1)).as("n_vectors"))
      .orderBy(col("label"), col("dim"))

  private val emb1Sql =
    """SELECT label, dim, round(avg(v), 6) AS centroid_v, COUNT(*) AS n_vectors
      |FROM (
      |  SELECT label,
      |    generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("emb1_label_centroids", "k-means centroid update (element-wise vector mean)", emb1LabelCentroids, Some(emb1Sql)),
    Q("sim3_ivf_topk", "IVF-probed ANN top-k (centroid inverted lists)", sim3IvfTopk, Some(sim3Sql)),
    Q("sd1_semdedup", "SemDeDup: cluster-blocked semantic dedup, min-id survivor", sd1SemDedup, Some(sd1Sql)),
    Q("tx4_regex_tokens", "regex word/punct + BPE-ish piece counting", tx4RegexTokens, Some(tx4Sql)),
    Q("tx1_token_stats", "token count / TTR / quality scoring", tx1TokenStats, Some(tx1Sql)),
    Q("tx2_langid", "n-gram-heuristic language ID", tx2LangId, Some(tx2Sql)),
    Q("tx3_fingerprint", "document + shingle fingerprints", tx3Fingerprint, Some(tx3Sql)),
    Q("dd1_exact_dedup", "exact dedup via content-hash groupBy", dd1ExactDedup, Some(dd1Sql)),
    Q("cp1_curation_pipeline", "end-to-end curation: dedup -> quality gate -> mixture sample -> rollup", cp1Curation, Some(cp1Sql)),
    Q("cp2_dedup_ladder", "full dedup ladder: exact -> minhash -> span gate -> semantic, per-tier rejects", cp2FullLadder, Some(cp2Sql)),
    Q("sp1_stratified_exact", "stratified exact-N sampling by deterministic hash rank", sp1StratifiedExact, Some(sp1Sql)),
    Q("dd2_minhash_pairs", "MinHash+LSH near-dup pairs, Jaccard-verified", dd2MinhashPairs, Some(dd2Sql)),
    Q("dd6_neardup_canonical", "near-dup canonicalization via min-label components", dd6NeardupCanonical, Some(dd6Sql)),
    Q("cc1_star_components", "connected components via alternating large-star/small-star contraction", cc1StarComponents, Some(dd6Sql)),
    Q("pr1_pagerank", "integer-exact damped PageRank over the near-dup graph (3 iterations)", pr1PageRank, Some(pr1Sql)),
    Q("kc1_kcore", "k-core decomposition of the near-dup graph (bounded synchronous peel, k=10, 3 unrolled rounds)", kc1KCore, Some(kc1Sql)),
    Q("lp1_label_communities", "deterministic synchronous label propagation: majority neighbor label, min-label ties, 3 unrolled rounds, community census", lp1LabelProp, Some(lp1Sql)),
    Q("tr1_triangles", "exact per-node triangle counts via degree-ordered orientation (out-degree O(sqrt m))", tr1Triangles, Some(tr1Sql)),
    Q("pj1_prefix_jaccard", "EXACT Jaccard>=0.9 similarity self-join via df-ordered prefix filtering", pj1PrefixJaccard, Some(pj1Sql)),
    Q("dd7_component_best", "best-quality canonical pick per near-dup component", dd7ComponentBest, Some(dd7Sql)),
    Q("qp1_quality_propagation", "quality smoothing over the near-dup graph (fixed-point)", qp1QualityProp, Some(qp1Sql)),
    Q("dd3_simhash_pairs", "SimHash near-dup pairs, Hamming-verified", dd3SimhashPairs, Some(dd3Sql)),
    Q("dd4_ngram_jaccard", "3-gram Jaccard dedup, blocked by source+lang", dd4NgramJaccard, Some(dd4Sql)),
    Q("dd5_cosine_neardup", "embedding-cosine near-dup, label-blocked", dd5CosineNearDup, Some(dd5Sql)),
    Q("dd8_dup_spans", "duplicated-span coverage: interval-merged cross-doc 8-gram runs", dd8DupSpans, Some(dd8Sql)),
    Q("ld1_line_dedup", "line-level corpus dedup: drop lines shared by >=2 docs, reassemble survivors in order (CCNet line-wise pass)", ld1LineDedup, Some(ld1Sql)),
    Q("dc1_decontaminate", "train/eval n-gram containment (inverted-index join)", dc1Decontaminate, Some(dc1Sql)),
    Q("pk1_sequence_packing", "greedy packing into 2048-token context windows", pk1SequencePacking, Some(pk1Sql)),
    Q("pk2_shelf_packing", "harmonic shelf packing: capacity-class bins that never overflow, full bins > half full by construction", pk2ShelfPacking, Some(pk2Sql)),
    Q("sm1_hash_sample", "deterministic hash-mod sampling, lang-stratified", sm1HashSample, Some(sm1Sql)),
    Q("ws1_weighted_sample", "deterministic weighted Bernoulli sampling by doc length", ws1WeightedSample, Some(ws1Sql)),
    Q("mx1_mixture_weights", "deterministic corpus-mixture reweighting by source", mx1Mixture, Some(mx1Sql)),
    Q("mx2_temperature_weights", "temperature (alpha=0.5) mixture weights from source counts", mx2Temperature, Some(mx2Sql)),
    Q("mx3_temperature_sample", "the temperature mixture MATERIALIZED: per-source hash-Bernoulli downsampling at sqrt(n_min/n_s), row-deterministic across engines", mx3TemperatureSample, Some(mx3Sql)),
    Q("im1_interleaved_mix", "weighted source interleaving: vt=rank/weight fair-queueing schedule, prefix proportions match the sqrt(n) weights", im1Interleave, Some(im1Sql)),
    Q("hn1_hard_negatives", "hard-negative mining: top-10 nearest different-label vectors per query (bounded-heap rank)", hn1HardNegatives, Some(hn1Sql)),
    Q("mv1_incremental_agg", "mergeable aggregate state: base+delta merge equals full recompute", mv1IncrementalAgg, Some(mv1Sql)),
    Q("mv2_retraction_agg", "retraction-maintained aggregate equals recompute over survivors", mv2Retraction, Some(mv2Sql)),
    Q("qc1_source_cap", "per-source contribution cap keeping best-quality docs", qc1SourceCap, Some(qc1Sql)),
    Q("sim1_brute_topk", "brute-force cosine top-k", sim1BruteTopk, Some(sim1Sql)),
    Q("ev1_ann_recall", "ANN evaluation: per-query recall@10 of IVF serve vs exact ground truth", ev1AnnRecall, Some(ev1Sql)),
    Q("sim2_lsh_topk", "SRP-LSH bucketed ANN top-k", sim2LshTopk, Some(sim2Sql)),
    Q("sim4_lsh_multiprobe", "multi-probe SRP-LSH: lowest-margin bit-flip buckets", sim4LshMultiprobe, Some(sim4Sql)),
    Q("sim5_pq_topk", "product-quantization ADC top-k (trained 4x16 codebooks, fixed-point LUT)", sim5PqTopk, Some(sim5Sql)),
    Q("sim6_ivf_pq", "IVF candidate pruning + PQ ADC scoring (composed ANN serving shape)", sim6IvfPq, Some(sim6Sql)),
    Q("ann1_lsh_index", "persisted LSH index: bucketed build + stored-bucket serve", ann1LshIndex, Some(sim2Sql)),
    Q("sim7_agg_topk", "top-k via bounded-heap aggregation (k-row partials, no window sort)", sim7AggTopk, Some(sim1Sql)),
    Q("ann2_ivf_index", "persisted IVF index: bucketed lists build + stored-list serve", ann2IvfIndex, Some(sim3Sql)),
    Q("ann3_ivfpq_index", "persisted IVF-PQ index: lists+codes build, code-only ADC serve", ann3IvfPqIndex, Some(sim6Sql)),
    Q("ann4_lsh_multiprobe", "persisted LSH index: multi-probe serve (recall-critical variant)", ann4LshMultiprobe, Some(sim4Sql)),
    Q("ann5_ivf_drift", "IVF centroid-drift signal: build-vs-append assignment-quality report", ann5IvfDrift, Some(ann5Sql)),
    Q("di1_dedup_index", "persisted MinHash dedup index: corpus build + new-batch probe", di1DedupIndex, Some(di1Sql)),
    Q("di2_index_append", "incremental index append: build older sources, append src1, probe src0", di2IndexAppend, Some(di1Sql)),
  )
}
