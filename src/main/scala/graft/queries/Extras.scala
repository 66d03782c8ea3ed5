package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops.{Multimodal, Ranking}
import graft.functions.DebeziumDecimalDecode.debezium_decimal

/** Coverage extras: multimodal plumbing, the custom decimal Expression
  * certified against independent arithmetic, JSON extraction, and
  * event-time windowed aggregations.
  */
object Extras extends QueryPack {

  // ---- MM1: media metadata over binary payloads --------------------------
  private def mm1MediaMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMeta(Multimodal.mediaTable(Tables.load(s, dir, "documents")))
      .orderBy(col("doc_id"))

  private val mm1Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS size_bytes,
      |  CASE WHEN doc_id % 3 = 0 THEN 64 + octet_length(encode(text)) % 512 END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN 64 + (octet_length(encode(text)) * 7) % 512 END AS height,
      |  CASE WHEN doc_id % 3 <> 0 THEN octet_length(encode(text)) * 10 END AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- MM2: frame sampling (binary-native substring + hash) --------------
  private def mm2FrameHashes(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.mediaTable(Tables.load(s, dir, "documents")),
        frameSize = 64, maxFrames = 4)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val mm2Sql =
    """SELECT doc_id, frame_idx, md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5
      |FROM documents,
      |  (SELECT range AS frame_idx FROM range(0, 4))
      |WHERE frame_idx < least(CAST(ceil(length(text) / 64.0) AS INTEGER), 4)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---- MM3: REAL PNG decode (javax.imageio) ------------------------------
  // Encode a deterministic tiny PNG per doc, then decode it with the
  // JDK codec inside mapPartitions. The oracle predicts the decoded
  // dimensions + fill color from doc_id alone — a hash match certifies
  // that a genuine codec ran and round-tripped losslessly.
  private def mm3PngDecode(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Multimodal.imageMeta(Multimodal.pngTable(Tables.load(s, dir, "documents"))),
      col("doc_id"))

  private val mm3Sql =
    """SELECT doc_id,
      |  CAST(1 + doc_id % 16 AS INTEGER) AS width,
      |  CAST(1 + (doc_id * 7) % 16 AS INTEGER) AS height,
      |  CAST((doc_id * 2654435761) % 16777216 AS INTEGER) AS rgb0
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- MM4: real resize chain --------------------------------------------
  // decode → nearest-neighbor resample to 4×4 → re-encode → decode
  // again: the full transcode chain through the actual JDK codec, with
  // an oracle that predicts the post-resize metadata from doc_id alone
  // (solid-color fills survive any resample).
  private def mm4Resize(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Multimodal.imageMeta(Multimodal.resizeImages(
        Multimodal.pngTable(Tables.load(s, dir, "documents")), 4, 4)),
      col("doc_id"))

  private val mm4Sql =
    """SELECT doc_id,
      |  CAST(4 AS INTEGER) AS width,
      |  CAST(4 AS INTEGER) AS height,
      |  CAST((doc_id * 2654435761) % 16777216 AS INTEGER) AS rgb0
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- MM5: perceptual-hash image dedup (REAL codec) ---------------------
  // The image half of dedup: every doc renders a deterministic 16×16
  // gradient PNG (docs sharing doc_id % 50 render the identical image),
  // the REAL JDK codec decodes it, and a 64-bit dHash (9×8
  // nearest-neighbor gray downsample, right-neighbor-brighter bits)
  // groups perceptual duplicates. The oracle predicts every hash bit
  // from the gradient arithmetic alone — a match certifies codec
  // round-trip + downsample + bit packing end to end. (Bit 63 lands as
  // the two's-complement sign term on both engines.)
  private def mm5PhashDedup(s: SparkSession, dir: String): DataFrame =
    Multimodal.dHash64(Multimodal.gradientPngTable(Tables.load(s, dir, "documents")))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("phash"))

  private val mm5Sql =
    """WITH g AS (SELECT doc_id, doc_id % 50 AS cls FROM documents),
      |grid AS (SELECT x.range AS x, y.range AS y FROM range(0, 8) x, range(0, 8) y),
      |s AS (
      |  SELECT doc_id, cls, x, y,
      |    ((x + 1) * 16) // 9 AS sx1, (x * 16) // 9 AS sx0, y * 2 AS sy
      |  FROM g, grid),
      |bits AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN
      |        ((1 + cls % 7) * sx1 * sx1 + (1 + cls % 11) * sy * sy
      |          + (cls % 13) * sx1 * sy + cls * 17) % 256
      |      > ((1 + cls % 7) * sx0 * sx0 + (1 + cls % 11) * sy * sy
      |          + (cls % 13) * sx0 * sy + cls * 17) % 256
      |      THEN CASE WHEN y * 8 + x = 63 THEN -9223372036854775807 - 1
      |                ELSE CAST(1 AS BIGINT) << CAST(y * 8 + x AS INTEGER) END
      |      ELSE 0 END) AS BIGINT) AS phash
      |  FROM s GROUP BY doc_id)
      |SELECT phash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      |FROM bits GROUP BY phash ORDER BY phash""".stripMargin

  // ---- MM7: perceptual NEAR-dup probe (Hamming-band blocking) ------------
  // The near-dup half mm5's exact-hash grouping cannot do: each class
  // representative (docs 0-49, one per gradient class) is probed with a
  // RETOUCHED variant of its image (one pixel painted white — at most
  // one dHash bit moves), and the Hamming-band join finds every stored
  // image within distance 3. Cross-class dHash distances are ≥ 12 by
  // the gradient arithmetic, so each probe matches exactly its own
  // class at distance ∈ {0, 1}. The oracle is the NAIVE QUADRATIC
  // bit_count(xor) join over arithmetically-predicted hashes — a hash
  // match certifies the banding has zero false negatives AND that the
  // retouch survived the real codec round trip.
  private def mm7PhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val reps = Tables.load(s, dir, "documents").filter(col("doc_id") < 50)
    val corpus = Multimodal.dHash64(Multimodal.gradientPngTable(reps))
    val probes = Multimodal.dHash64(Multimodal.gradientPngTableRetouched(reps))
    Multimodal.dHashNearDupPairs(corpus, probes, maxDist = 3)
      .orderBy(col("probe_id"), col("match_id"))
  }

  private val mm7Sql =
    """WITH g AS (SELECT doc_id, doc_id % 50 AS cls FROM documents WHERE doc_id < 50),
      |grid AS (SELECT x.range AS x, y.range AS y FROM range(0, 8) x, range(0, 8) y),
      |s AS (
      |  SELECT doc_id, cls, x, y,
      |    ((1 + cls % 7) * (((x + 1) * 16) // 9) * (((x + 1) * 16) // 9)
      |      + (1 + cls % 11) * (y * 2) * (y * 2)
      |      + (cls % 13) * (((x + 1) * 16) // 9) * (y * 2) + cls * 17) % 256 AS gv1,
      |    ((1 + cls % 7) * ((x * 16) // 9) * ((x * 16) // 9)
      |      + (1 + cls % 11) * (y * 2) * (y * 2)
      |      + (cls % 13) * ((x * 16) // 9) * (y * 2) + cls * 17) % 256 AS gv0
      |  FROM g, grid),
      |cb AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN gv1 > gv0
      |    THEN CASE WHEN y * 8 + x = 63 THEN -9223372036854775807 - 1
      |              ELSE CAST(1 AS BIGINT) << CAST(y * 8 + x AS INTEGER) END
      |    ELSE 0 END) AS BIGINT) AS phash
      |  FROM s GROUP BY doc_id),
      |pb AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN
      |      (CASE WHEN x = 7 AND y = 0 THEN 255 ELSE gv1 END) > gv0
      |    THEN CASE WHEN y * 8 + x = 63 THEN -9223372036854775807 - 1
      |              ELSE CAST(1 AS BIGINT) << CAST(y * 8 + x AS INTEGER) END
      |    ELSE 0 END) AS BIGINT) AS phash
      |  FROM s GROUP BY doc_id)
      |SELECT p.doc_id AS probe_id, c.doc_id AS match_id,
      |  CAST(bit_count(xor(p.phash, c.phash)) AS INTEGER) AS hamming_dist
      |FROM pb p JOIN cb c ON bit_count(xor(p.phash, c.phash)) <= 3
      |ORDER BY probe_id, match_id""".stripMargin

  // ---- MM6: REAL WAV decode (javax.sound.sampled) ------------------------
  // Encode 640 samples of deterministic 16-bit PCM pseudo-noise per doc
  // as a genuine RIFF/WAVE file, decode it back through the JDK audio
  // stack (header, format, endianness all from the real parser), and
  // emit per-160-sample-frame peak/energy. The oracle predicts every
  // decoded sample from doc_id alone — a hash match certifies the
  // codec round trip bit-for-bit.
  private def mm6WavFeatures(s: SparkSession, dir: String): DataFrame =
    Ranking.orderByOnce(
      Multimodal.wavFrameFeatures(
        Multimodal.wavTable(Tables.load(s, dir, "documents"))),
      col("doc_id"), col("frame_idx"))

  private val mm6Sql =
    """WITH s AS (
      |  SELECT doc_id, i, ((doc_id * 31 + i * i * 7) % 2001) - 1000 AS v
      |  FROM documents, (SELECT range AS i FROM range(0, 640)))
      |SELECT doc_id, i // 160 AS frame_idx, COUNT(*) AS n_samples,
      |  MAX(abs(v)) AS peak, CAST(SUM(v * v) AS BIGINT) AS energy
      |FROM s GROUP BY doc_id, frame_idx
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---- MM8: energy-gated segmentation (VAD shape) -------------------------
  // Speech-with-pauses fixture: every third 160-sample frame is MUTED
  // (staggered by doc id), synthesized through the REAL JDK WAV
  // encode→decode round trip, then segmented by frame energy —
  // gaps-and-islands per doc with a 2-frame debounce, so docs carry
  // single runs, split runs, AND short runs the debounce must drop
  // (doc_id%3 ∈ {1,2} plants a 1-frame segment each). The oracle
  // predicts every decoded sample analytically and restates the
  // islands via SQL windows.
  private def mm8VadSegments(s: SparkSession, dir: String): DataFrame =
    Multimodal.energySegments(
      Multimodal.wavFrameFeatures(
        Multimodal.wavTable(Tables.load(s, dir, "documents"),
          sampleFn = (id, i) => Multimodal.wavGatedSample(id, i))),
      threshold = 0L, minFrames = 2)
      .orderBy(col("doc_id"), col("seg_idx"))

  private val mm8Sql =
    """WITH s AS (
      |  SELECT doc_id, i, CASE WHEN (doc_id + i // 160) % 3 = 0 THEN 0
      |    ELSE ((doc_id * 31 + i * i * 7) % 2001) - 1000 END AS v
      |  FROM documents, (SELECT range AS i FROM range(0, 640))),
      |f AS (SELECT doc_id, i // 160 AS frame_idx,
      |        CAST(SUM(v * v) AS BIGINT) AS energy
      |      FROM s GROUP BY doc_id, frame_idx),
      |m AS (SELECT doc_id, frame_idx, energy, energy > 0 AS act,
      |        CASE WHEN energy > 0 AND NOT coalesce(
      |          lag(energy > 0) OVER (PARTITION BY doc_id ORDER BY frame_idx),
      |          FALSE) THEN 1 ELSE 0 END AS newseg
      |      FROM f),
      |g AS (SELECT doc_id, frame_idx, energy,
      |        SUM(newseg) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS seg
      |      FROM m WHERE act),
      |a AS (SELECT doc_id, seg, MIN(frame_idx) AS start_frame,
      |        MAX(frame_idx) AS end_frame, COUNT(*) AS n_frames,
      |        CAST(SUM(energy) AS BIGINT) AS energy
      |      FROM g GROUP BY doc_id, seg HAVING COUNT(*) >= 2)
      |SELECT doc_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)
      |    AS BIGINT) AS seg_idx,
      |  start_frame, end_frame, n_frames, energy
      |FROM a ORDER BY doc_id, seg_idx""".stripMargin

  // ---- MM9: segment-level audio near-dup ----------------------------------
  // mm8's VAD segments get the dedup-ladder treatment: each segment is
  // the SET of its frames' content fingerprints, candidates block on a
  // shared fingerprint (inverted-index, dd4's shape), survivors verify
  // by exact Jaccard. wavPairSample plants near-identical clips in
  // pairs (docs 2k/2k+1 share all frame content except one perturbed
  // frame each), so the oracle predicts every sample — and therefore
  // every fingerprint and every pair — analytically.
  // mm9 and mm10 share ONE wav decode + segmentation + pair stage per
  // (session, dir): the real WAV round-trip dominates both queries, and
  // the canonicalization must not re-decode the corpus (the dd2/dd6
  // pair-cache contract — same-session reuse only, dead sessions
  // evicted)
  private[graft] val wavStageCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), (Seq[Int], DataFrame, DataFrame)]

  /** Serializes wav-stage builds: the eviction id set is the
    * persistent-RDD-id DELTA around a build, and a CONCURRENT persist in
    * the same session (another key's build racing through
    * computeIfAbsent's other bin, or any parallel query's
    * localCheckpoint) would land inside the delta — later stale-token
    * eviction would then unpersist live truncated-lineage blocks it
    * doesn't own, failing their still-cached consumer unrecoverably.
    * One lock around delta+build makes the delta exactly this entry's
    * block set. (Builds are rare — once per (session, dir, token) — so
    * the serialization costs nothing in steady state.)
    */
  private val wavBuildLock = new Object

  /** Snapshot token (max leaf mtime + total size + file count of
    * documents.parquet) in the cache key — the PipelineQueries.dirToken
    * contract: a same-session data rewrite must miss the cache, not
    * serve stale checkpointed frames. Size+count close mtime's
    * filesystem-granularity window (a same-second rewrite that keeps
    * every timestamp still changes bytes or file count in practice).
    */
  private def wavDirToken(dir: String): String = {
    val p = java.nio.file.Paths.get(dir, "documents.parquet")
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      val st = java.nio.file.Files.walk(p)
      try {
        var (maxM, size, n) = (0L, 0L, 0L)
        st.forEach { f =>
          val file = f.toFile
          if (file.isFile) {
            maxM = math.max(maxM, file.lastModified); size += file.length(); n += 1
          }
        }
        s"$maxM:$size:$n"
      } finally st.close()
    }
  }

  private[graft] def sharedWavSegPairs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val token = wavDirToken(dir)
    // evict dead-session entries (their blocks died with the context)
    // and stale-token entries for THIS (session, dir) — unpersisting the
    // stale entries' localCheckpoint blocks, which otherwise linger
    // until ContextCleaner GC
    val it = wavStageCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (k._1.sparkContext.isStopped) it.remove()
      else if (k._1 == s && k._2 == dir && k._3 != token) {
        // Dataset.unpersist only reaches CacheManager-cached plans; a
        // localCheckpoint's blocks belong to internal RDDs (including
        // segmentNearDupPairs' tok intermediate, unreachable from the
        // returned plans' truncated lineage) — the entry carries the
        // persistent-RDD ids its build pinned, unpersist those
        val (ids, _, _) = e.getValue
        val persisted = s.sparkContext.getPersistentRDDs
        ids.foreach(id =>
          persisted.get(id).foreach(r => scala.util.Try(r.unpersist(blocking = false))))
        it.remove()
      }
    }
    val (_, segs, pairs) = wavStageCache.computeIfAbsent((s, dir, token), _ => wavBuildLock.synchronized {
      // pinned: the segmentation AND the fingerprint extraction both
      // read the frames — without the checkpoint each consumer re-runs
      // the real WAV encode+decode over the whole corpus. The builds are
      // eager (localCheckpoint(true)), so the persistent-RDD id delta
      // around the build is exactly this entry's block set — recorded so
      // eviction can free it (same single-session sharing contract as
      // the cache itself).
      val before = s.sparkContext.getPersistentRDDs.keySet
      val frames = Multimodal.wavFrameFeatures(
        Multimodal.wavTable(Tables.load(s, dir, "documents"), nSamples = 1600,
          sampleFn = (id, i) => Multimodal.wavPairSample(id, i)))
        .localCheckpoint(true)
      val segs = Multimodal.energySegments(frames, threshold = 0L, minFrames = 2)
        .localCheckpoint(true)
      val pairs = Multimodal.segmentNearDupPairs(frames, segs,
          minJaccard6 = 500000L)
        .localCheckpoint(true)
      val ids = (s.sparkContext.getPersistentRDDs.keySet -- before).toSeq
      (ids, segs, pairs)
    })
    (segs, pairs)
  }

  private def mm9SegmentNearDup(s: SparkSession, dir: String): DataFrame =
    sharedWavSegPairs(s, dir)._2
      .orderBy(col("doc_id1"), col("seg_idx1"), col("doc_id2"), col("seg_idx2"))

  private val mm9Sql =
    """WITH s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN ((doc_id // 2) + (i // 160)) % 5 = 0 THEN 0
      |         WHEN i // 160 = (doc_id % 2) * 3 + 2
      |           THEN ((doc_id * 13 + i * 11) % 2001) - 1000
      |         ELSE (((doc_id // 2) * 31 + i * i * 7) % 2001) - 1000 END AS v
      |  FROM documents, (SELECT range AS i FROM range(0, 1600))),
      |f AS (SELECT doc_id, i // 160 AS frame_idx,
      |        CAST(SUM(v * v) AS BIGINT) AS energy,
      |        CAST(MAX(ABS(v)) AS BIGINT) AS peak
      |      FROM s GROUP BY doc_id, frame_idx),
      |m AS (SELECT doc_id, frame_idx, energy, peak, energy > 0 AS act,
      |        CASE WHEN energy > 0 AND NOT coalesce(
      |          lag(energy > 0) OVER (PARTITION BY doc_id ORDER BY frame_idx),
      |          FALSE) THEN 1 ELSE 0 END AS newseg
      |      FROM f),
      |g AS (SELECT doc_id, frame_idx, energy, peak,
      |        SUM(newseg) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS seg
      |      FROM m WHERE act),
      |a AS (SELECT doc_id, seg, MIN(frame_idx) AS start_frame, COUNT(*) AS nf
      |      FROM g GROUP BY doc_id, seg HAVING COUNT(*) >= 2),
      |sgs AS (SELECT doc_id, seg,
      |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)
      |          AS BIGINT) AS seg_idx
      |      FROM a),
      |tok AS (SELECT DISTINCT g.doc_id, sgs.seg_idx,
      |          CAST(g.energy AS VARCHAR) || ':' || CAST(g.peak AS VARCHAR) AS tok
      |        FROM g JOIN sgs ON g.doc_id = sgs.doc_id AND g.seg = sgs.seg),
      |sz AS (SELECT doc_id, seg_idx, COUNT(*) AS n_tok FROM tok GROUP BY 1, 2),
      |pr AS (SELECT x.doc_id AS doc_id1, x.seg_idx AS seg_idx1,
      |          y.doc_id AS doc_id2, y.seg_idx AS seg_idx2,
      |          CAST(COUNT(*) AS BIGINT) AS n_inter
      |        FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |        GROUP BY 1, 2, 3, 4)
      |SELECT doc_id1, seg_idx1, doc_id2, seg_idx2, n_inter,
      |  CAST(floor(n_inter * 1000000.0 / (s1.n_tok + s2.n_tok - n_inter) + 0.5)
      |    AS BIGINT) AS jaccard6
      |FROM pr
      |JOIN sz s1 ON pr.doc_id1 = s1.doc_id AND pr.seg_idx1 = s1.seg_idx
      |JOIN sz s2 ON pr.doc_id2 = s2.doc_id AND pr.seg_idx2 = s2.seg_idx
      |WHERE floor(n_inter * 1000000.0 / (s1.n_tok + s2.n_tok - n_inter) + 0.5)
      |  >= 500000
      |ORDER BY doc_id1, seg_idx1, doc_id2, seg_idx2""".stripMargin

  // ---- MM10: audio keep-one canonicalization ------------------------------
  // mm9's near-dup PAIRS become connected components (the same star
  // contraction dd6/cc1 certify on text) and each component elects one
  // surviving segment — highest energy, ties on smallest (doc, seg).
  // Rides mm9's cached wav stage; the oracle recomputes the components
  // with a recursive CTE over the analytically-predicted pairs.
  private def mm10SegmentKeepOne(s: SparkSession, dir: String): DataFrame = {
    val (segs, pairs) = sharedWavSegPairs(s, dir)
    Multimodal.segmentCanonical(segs, pairs)
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  private val mm10Sql =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, i,
      |    CASE WHEN ((doc_id // 2) + (i // 160)) % 5 = 0 THEN 0
      |         WHEN i // 160 = (doc_id % 2) * 3 + 2
      |           THEN ((doc_id * 13 + i * 11) % 2001) - 1000
      |         ELSE (((doc_id // 2) * 31 + i * i * 7) % 2001) - 1000 END AS v
      |  FROM documents, (SELECT range AS i FROM range(0, 1600))),
      |f AS (SELECT doc_id, i // 160 AS frame_idx,
      |        CAST(SUM(v * v) AS BIGINT) AS energy,
      |        CAST(MAX(ABS(v)) AS BIGINT) AS peak
      |      FROM s GROUP BY doc_id, frame_idx),
      |m AS (SELECT doc_id, frame_idx, energy, peak, energy > 0 AS act,
      |        CASE WHEN energy > 0 AND NOT coalesce(
      |          lag(energy > 0) OVER (PARTITION BY doc_id ORDER BY frame_idx),
      |          FALSE) THEN 1 ELSE 0 END AS newseg
      |      FROM f),
      |g AS (SELECT doc_id, frame_idx, energy, peak,
      |        SUM(newseg) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS seg
      |      FROM m WHERE act),
      |a AS (SELECT doc_id, seg, MIN(frame_idx) AS start_frame,
      |        CAST(SUM(energy) AS BIGINT) AS seg_energy, COUNT(*) AS nf
      |      FROM g GROUP BY doc_id, seg HAVING COUNT(*) >= 2),
      |sgs AS (SELECT doc_id, seg, seg_energy,
      |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)
      |          AS BIGINT) AS seg_idx
      |      FROM a),
      |tok AS (SELECT DISTINCT g.doc_id, sgs.seg_idx,
      |          CAST(g.energy AS VARCHAR) || ':' || CAST(g.peak AS VARCHAR) AS tok
      |        FROM g JOIN sgs ON g.doc_id = sgs.doc_id AND g.seg = sgs.seg),
      |sz AS (SELECT doc_id, seg_idx, COUNT(*) AS n_tok FROM tok GROUP BY 1, 2),
      |pr AS (SELECT x.doc_id AS doc_id1, x.seg_idx AS seg_idx1,
      |          y.doc_id AS doc_id2, y.seg_idx AS seg_idx2,
      |          CAST(COUNT(*) AS BIGINT) AS n_inter
      |        FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc_id < y.doc_id
      |        GROUP BY 1, 2, 3, 4),
      |pairs AS (SELECT doc_id1, seg_idx1, doc_id2, seg_idx2 FROM pr
      |  JOIN sz s1 ON pr.doc_id1 = s1.doc_id AND pr.seg_idx1 = s1.seg_idx
      |  JOIN sz s2 ON pr.doc_id2 = s2.doc_id AND pr.seg_idx2 = s2.seg_idx
      |  WHERE floor(n_inter * 1000000.0 / (s1.n_tok + s2.n_tok - n_inter) + 0.5)
      |    >= 500000),
      |nodes AS (SELECT doc_id, seg_idx, seg_energy,
      |          doc_id * 100 + seg_idx AS nid FROM sgs),
      |edges AS (SELECT doc_id1 * 100 + seg_idx1 AS src,
      |                 doc_id2 * 100 + seg_idx2 AS dst FROM pairs
      |          UNION SELECT doc_id2 * 100 + seg_idx2,
      |                 doc_id1 * 100 + seg_idx1 FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT nid, nid FROM nodes
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
      |lab AS (SELECT n.doc_id, n.seg_idx, n.seg_energy, c.lbl
      |        FROM nodes n JOIN comp c ON c.id = n.nid),
      |best AS (SELECT lbl, doc_id AS keep_doc_id, seg_idx AS keep_seg_idx,
      |          row_number() OVER (PARTITION BY lbl
      |            ORDER BY seg_energy DESC, doc_id, seg_idx) AS rn
      |        FROM lab)
      |SELECT l.doc_id, l.seg_idx, b.keep_doc_id, b.keep_seg_idx
      |FROM lab l JOIN best b ON b.lbl = l.lbl AND b.rn = 1
      |ORDER BY l.doc_id, l.seg_idx""".stripMargin

  // ---- SK1: salted join on a deliberately skewed key ---------------------
  // ~1/3 of events collapse onto hot key 7; the salted join spreads that
  // key over 8 shuffle partitions (salt derived from event_id) while the
  // exploded 50-row dim side still matches every salted row. The oracle
  // restates the UNSALTED join — a hash match proves salting is
  // result-invisible.
  private def sk1SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .withColumn("k", when(col("event_id") % 3 === 0, 7L).otherwise(col("user_id") % 50))
    val dim = Tables.load(s, dir, "customer")
      .groupBy((col("c_custkey") % 50).as("k"))
      .agg(min(col("c_name")).as("label"))
    graft.ops.Skew.saltedJoin(ev, dim, "k", salts = 8, saltSource = col("event_id"))
      .groupBy(col("k"), col("label"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("k"))
  }

  private val sk1Sql =
    """WITH ev AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN 7 ELSE user_id % 50 END AS k, value
      |  FROM events),
      |dim AS (SELECT c_custkey % 50 AS k, MIN(c_name) AS label FROM customer GROUP BY 1)
      |SELECT ev.k, label, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM ev JOIN dim ON ev.k = dim.k
      |GROUP BY ev.k, label ORDER BY ev.k""".stripMargin

  // ---- P7: VariableScaleDecimal decode (custom Catalyst Expression) -----
  // The oracle recomputes BigInteger(ascii-bytes)/10^scale from first
  // principles — a hash match certifies DebeziumDecimalDecode incl. its
  // codegen path, since Verify runs with whole-stage codegen on.
  private def p7DebeziumDecimal(s: SparkSession, dir: String): DataFrame = {
    val v = col("o_orderkey").cast("string")
    val json = concat(lit("{\"scale\":2,\"value\":\""),
      base64(v.cast("binary")), lit("\"}"))
    Ranking.orderByOnce(
      Ranking.spread(Tables.load(s, dir, "orders").select(col("o_orderkey")),
          col("o_orderkey"))
        .select(col("o_orderkey"), debezium_decimal(json).cast("double").as("decoded")),
      col("o_orderkey"))
  }

  private val p7Sql =
    """SELECT o_orderkey,
      |  CAST(list_sum([ascii(substr(v, i + 1, 1)) * (256.0 ** (length(v) - 1 - i))
      |                 for i in range(0, length(v))]) AS BIGINT) / 100.0 AS decoded
      |FROM (SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS v FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---- JS1: JSON extraction from the props column ------------------------
  private def js1JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"))
      .orderBy(col("k_mod"))

  private val js1Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  // ---- VR1: VariantType semi-structured extraction -----------------------
  // The open-schema path: props parses ONCE into Spark 4's binary
  // VariantType (no schema declared up front, unlike from_json), then
  // typed field extraction. At 100 TB this is the shredded
  // semi-structured scan: parse cost is one pass, the variant binary
  // is columnar-friendly, and variant_get is codegen'd — against
  // get_json_object, which re-parses the JSON text per extraction.
  private def vr1VariantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  private val vr1Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- W3: tumbling event-time window ------------------------------------
  private def w3TumblingHourly(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("hour_start"))

  private val w3Sql =
    """SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  // ---- W4: sliding event-time window (2 h, slide 1 h) --------------------
  private def w4Sliding2h(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour").getField("start").as("win_start"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("win_start"))

  private val w4Sql =
    """SELECT win_start, COUNT(*) AS n_events FROM (
      |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
      |                 date_trunc('hour', ts)]) AS win_start
      |  FROM events)
      |GROUP BY 1 ORDER BY win_start""".stripMargin

  // ---- FM1: FIELD_MERGE conflict policy ----------------------------------
  // Two conflicting change sets per user (latest click vs latest
  // purchase); merged column-wise with click side preferred, purchase
  // filling nulls (docs/02-설계/03_케이스_분류.md:379-426 semantics).
  private def fm1FieldMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    def latest(kind: String) = graft.cdc.Conflict.lww(
      ev.filter(col("event_type") === kind), "user_id", "ts", "event_id")
      .select(col("user_id"),
        col("value").as("value"), col("ts").as("changed_at"))
    val clicks = latest("click")
    val purchases = latest("purchase")
    graft.cdc.Conflict.fieldMerge(clicks, purchases, "user_id",
        Seq("value", "changed_at"))
      .orderBy(col("user_id"))
  }

  private val fm1Sql =
    """WITH clicks AS (
      |  SELECT user_id, value, ts AS changed_at FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      |    FROM events WHERE event_type = 'click') WHERE rn = 1),
      |purchases AS (
      |  SELECT user_id, value, ts AS changed_at FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      |    FROM events WHERE event_type = 'purchase') WHERE rn = 1)
      |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |  COALESCE(c.value, p.value) AS value,
      |  CAST(COALESCE(c.changed_at, p.changed_at) AS TIMESTAMP) AS changed_at
      |FROM clicks c FULL OUTER JOIN purchases p ON c.user_id = p.user_id
      |ORDER BY user_id""".stripMargin

  // ---- A4: newest-N ring buffer as a typed Aggregator --------------------
  // The array is rendered as a comma-joined string so the driver's
  // pandas hash-compare (which cannot sort ndarray cells) stays green.
  private def a4RingAgg(s: SparkSession, dir: String): DataFrame = {
    val newest3 = graft.functions.RingBuffer.newestN(3)
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(concat_ws(",",
        newest3(unix_micros(col("ts")), col("event_id")).cast("array<string>"))
        .as("newest_ids"))
      .orderBy(col("event_type"))
  }

  private val a4Sql =
    """SELECT event_type,
      |  array_to_string((list(event_id ORDER BY ts DESC, event_id DESC))[1:3], ',') AS newest_ids
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- DQ1: data-quality expectation gate --------------------------------
  // Every row-local check folds into ONE aggregation over ONE scan
  // (conditional violation counters); the referential check is the one
  // LEFT ANTI join. Exact integer counts — a deterministic gate, not a
  // float score. The discount bound is deliberately violated (26k+
  // rows) so the report exercises the failing path.
  private def dq1QualityGate(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Quality
    val li = Tables.load(s, dir, "lineitem")
    Quality.report(li, Seq(
        Quality.notNull("l_shipdate"),
        Quality.inRange("l_quantity", 1, 50),
        Quality.inRange("l_discount", 0.0, 0.05),
        Quality.inSet("l_returnflag", Seq("A", "N", "R")),
        Quality.unique("l_orderkey", "l_linenumber")))
      .unionByName(Quality.fkOrphans(li, "l_orderkey",
        Tables.load(s, dir, "orders"), "o_orderkey"))
      .orderBy(col("check"))
  }

  private val dq1Sql =
    """WITH base AS (
      |  SELECT
      |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS nn,
      |    SUM(CASE WHEN l_quantity IS NULL OR l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS qr,
      |    SUM(CASE WHEN l_discount IS NULL OR l_discount NOT BETWEEN 0.0 AND 0.05 THEN 1 ELSE 0 END) AS dr,
      |    SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS rf,
      |    COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS uq
      |  FROM lineitem),
      |fk AS (
      |  SELECT COUNT(*) AS orphans FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |rows_out AS (
      |  SELECT 'not_null(l_shipdate)' AS check, nn AS violations FROM base
      |  UNION ALL SELECT 'in_range(l_quantity)', qr FROM base
      |  UNION ALL SELECT 'in_range(l_discount)', dr FROM base
      |  UNION ALL SELECT 'in_set(l_returnflag)', rf FROM base
      |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', uq FROM base
      |  UNION ALL SELECT 'fk(l_orderkey)', orphans FROM fk)
      |SELECT "check", CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS passed
      |FROM rows_out ORDER BY "check"""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("fm1_field_merge", "FIELD_MERGE conflict policy (column-wise coalesce)", fm1FieldMerge, Some(fm1Sql)),
    Q("a4_ring_agg", "A4 newest-N ring buffer as typed Aggregator", a4RingAgg, Some(a4Sql)),
    Q("mm1_media_meta", "multimodal: typed metadata over binary payloads", mm1MediaMeta, Some(mm1Sql)),
    Q("mm2_frame_hashes", "multimodal: fixed-size frame sampling", mm2FrameHashes, Some(mm2Sql)),
    Q("mm3_png_decode", "multimodal: real JDK PNG encode→decode round trip", mm3PngDecode, Some(mm3Sql)),
    Q("mm4_resize", "multimodal: decode → nearest-neighbor resize → re-encode → decode", mm4Resize, Some(mm4Sql)),
    Q("mm5_phash_dedup", "multimodal: perceptual dHash dedup over real decoded pixels", mm5PhashDedup, Some(mm5Sql)),
    Q("mm7_phash_neardup", "multimodal: Hamming-band perceptual NEAR-dup probe (retouched variants matched within distance 3; quadratic oracle certifies zero false negatives)", mm7PhashNearDup, Some(mm7Sql)),
    Q("mm6_wav_features", "multimodal: real JDK WAV encode->decode + per-frame audio features", mm6WavFeatures, Some(mm6Sql)),
    Q("mm8_vad_segments", "multimodal: energy-gated VAD segmentation (gaps-and-islands per clip, 2-frame debounce) over really-decoded WAV frames", mm8VadSegments, Some(mm8Sql)),
    Q("mm9_segment_near_dup", "multimodal: segment-level audio near-dup — frame-fingerprint sets per VAD segment, inverted-index blocking, exact Jaccard verify", mm9SegmentNearDup, Some(mm9Sql)),
    Q("mm10_segment_keep_one", "multimodal: audio keep-one canonicalization — mm9 pairs -> star-contraction components -> per-component best segment (highest energy, deterministic ties)", mm10SegmentKeepOne, Some(mm10Sql)),
    Q("sk1_salted_join", "salted join spreads a deliberately hot key", sk1SaltedJoin, Some(sk1Sql)),
    Q("p7_debezium_decimal", "P7 VariableScaleDecimal custom Expression", p7DebeziumDecimal, Some(p7Sql)),
    Q("js1_json_extract", "JSON field extraction + aggregation", js1JsonExtract, Some(js1Sql)),
    Q("vr1_variant_extract", "VariantType parse-once semi-structured extraction (Spark 4 variant)", vr1VariantExtract, Some(vr1Sql)),
    Q("w3_tumbling_hourly", "tumbling event-time window aggregation", w3TumblingHourly, Some(w3Sql)),
    Q("w4_sliding_2h", "sliding event-time window aggregation", w4Sliding2h, Some(w4Sql)),
    Q("dq1_quality_gate", "declarative data-quality expectations: one-scan violation counters + FK anti-join", dq1QualityGate, Some(dq1Sql)),
  )

}
