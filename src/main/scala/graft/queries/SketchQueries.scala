package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Embeddings, Sketches, Stats, TextQuality}

/** Sketch + embedding-utility operators: deterministic HyperLogLog,
  * int8 quantization, per-dimension corpus statistics. All three keep
  * their arithmetic exact (integers / fixed-point / dyadic rationals)
  * until one final correctly-rounded division, so even the approximate
  * results hash-match the DuckDB restatements.
  */
object SketchQueries extends QueryPack {

  // ---- HLL1: HyperLogLog distinct estimate -------------------------------
  private def hll1Sketch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val exact = ev.agg(count_distinct(col("event_id")).as("n_exact"))
    Sketches.hllDistinct(ev, col("event_id"))
      .crossJoin(broadcast(exact))
      .select(col("n_exact"), col("hll_estimate"), col("buckets_used"), col("max_register"))
  }

  private val hll1Sql =
    """WITH h AS (
      |  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT h % 256 AS bucket,
      |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
      |  FROM h),
      |reg AS (SELECT bucket, MAX(rho) AS r FROM r GROUP BY bucket),
      |s AS (
      |  SELECT COUNT(*) AS used,
      |    SUM((1::BIGINT) << (53 - r)) AS dsum,
      |    MAX(r) AS maxr
      |  FROM reg)
      |SELECT (SELECT COUNT(DISTINCT event_id) FROM events) AS n_exact,
      |  floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0)
      |    / CAST(CAST(dsum AS BIGINT) + (256 - used) * ((1::BIGINT) << 53) AS DOUBLE)
      |    * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate,
      |  CAST(used AS BIGINT) AS buckets_used, CAST(maxr AS BIGINT) AS max_register
      |FROM s""".stripMargin

  // ---- HLL3: one HLL estimate per group ----------------------------------
  // The "distinct users per segment" rollup at sketch cost: per-group
  // constant-size register state, values collapsed map-side — vs cd1's
  // exact count_distinct, whose exchange carries every distinct value.
  // Exact per-group counts ride along as the accuracy reference.
  private def hll3GroupedSketch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    Sketches.hllDistinctBy(ev, col("event_type"), col("user_id"))
      .withColumnRenamed("g", "event_type")
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("hll_estimate"),
        col("buckets_used"), col("max_register"))
      .orderBy(col("event_type"))
  }

  private val hll3Sql =
    """WITH h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h % 256 AS bucket,
      |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
      |  FROM h),
      |reg AS (SELECT event_type, bucket, MAX(rho) AS r FROM r GROUP BY event_type, bucket),
      |s AS (
      |  SELECT event_type, COUNT(*) AS used,
      |    SUM((1::BIGINT) << (53 - r)) AS dsum,
      |    MAX(r) AS maxr
      |  FROM reg GROUP BY event_type),
      |e AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      |      FROM events GROUP BY event_type)
      |SELECT s.event_type, n_exact,
      |  floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0)
      |    / CAST(CAST(dsum AS BIGINT) + (256 - used) * ((1::BIGINT) << 53) AS DOUBLE)
      |    * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate,
      |  CAST(used AS BIGINT) AS buckets_used, CAST(maxr AS BIGINT) AS max_register
      |FROM s JOIN e USING (event_type) ORDER BY event_type""".stripMargin

  // ---- QZ1: int8 quantization --------------------------------------------
  private def qz1Quantize(s: SparkSession, dir: String): DataFrame =
    Embeddings.quantizeInt8(Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  private val qz1Sql =
    """WITH b AS (
      |  SELECT vec_id, embedding,
      |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS amax
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, amax,
      |    CASE WHEN amax = 0.0 THEN [0::BIGINT for x in embedding]
      |         ELSE [CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)
      |               for x in embedding] END AS ql
      |  FROM b)
      |SELECT vec_id,
      |  floor(amax * 1000000.0 + 0.5) / 1000000.0 AS amax6,
      |  CAST(list_sum(ql) AS BIGINT) AS q_sum,
      |  list_min(ql) AS q_min, list_max(ql) AS q_max
      |FROM q ORDER BY vec_id""".stripMargin

  // ---- DIM1: per-dimension stats -----------------------------------------
  private def dim1DimStats(s: SparkSession, dir: String): DataFrame =
    Embeddings.dimStats(Tables.load(s, dir, "embeddings"), "embedding")
      .orderBy(col("dim"))

  private val dim1Sql =
    """WITH q AS (
      |  SELECT i AS dim,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM embeddings, range(1, 65) t(i)),
      |a AS (
      |  SELECT dim, COUNT(*) AS n,
      |    CAST(SUM(q) AS BIGINT) AS qsum, CAST(SUM(q * q) AS BIGINT) AS qsq
      |  FROM q GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  floor(CAST(qsum AS DOUBLE) / n / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS mean6,
      |  floor((CAST(qsq AS DOUBLE) / n
      |         - (CAST(qsum AS DOUBLE) / n) * (CAST(qsum AS DOUBLE) / n))
      |        / 1000000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS var6
      |FROM a ORDER BY dim""".stripMargin

  // ---- CM1: count-min sketch ---------------------------------------------
  // Build a 4×64 count-min table over document tokens, then probe it
  // with the exact top-10 vocabulary: estimate >= exact always, equal
  // when a token's 4 buckets are collision-free.
  private def cm1CountMin(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val toks = docs.select(explode(
      graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
    val table = Sketches.countMinTable(toks, col("token"), d = 4, w = 64)
    val top10 = TextQuality.vocabTopK(docs, "text", 10)
    Sketches.countMinEstimate(table, top10.select("token"), "token", d = 4, w = 64)
      .join(top10, Seq("token"))
      .select(col("rank").cast("long"), col("token"), col("n"), col("cm_estimate"))
      .orderBy(col("rank"))
  }

  private val cm1Sql =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents),
      |tc AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
      |top10 AS (
      |  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rank
      |  FROM tc ORDER BY n DESC, token LIMIT 10),
      |cells AS (
      |  SELECT r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || token), 1, 15))::BIGINT % 64 AS bucket,
      |    COUNT(*) AS c
      |  FROM toks, range(0, 4) t(r) GROUP BY 1, 2),
      |probes AS (
      |  SELECT token, n, rank, r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || token), 1, 15))::BIGINT % 64 AS bucket
      |  FROM top10, range(0, 4) t(r))
      |SELECT CAST(p.rank AS BIGINT) AS rank, p.token, p.n,
      |  CAST(MIN(c.c) AS BIGINT) AS cm_estimate
      |FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
      |GROUP BY p.rank, p.token, p.n
      |ORDER BY rank""".stripMargin

  // ---- BL1: Bloom filter -------------------------------------------------
  // Build a 16384-bit / 3-hash Bloom filter over purchase event ids,
  // probe all event ids < 5000: flagged >= members always, and the
  // false-positive count is itself deterministic (md5 bit positions,
  // integer bit words) so even the FP band hash-matches.
  private def bl1Bloom(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val members = ev.filter(col("event_type") === "purchase")
      .select(col("event_id")).distinct()
    val filter = Sketches.bloomBuild(members, col("event_id"), mBits = 16384, k = 3)
    val probes = ev.filter(col("event_id") < 5000).select(col("event_id")).distinct()
    val flags = Sketches.bloomProbe(filter, probes, "event_id", mBits = 16384, k = 3)
    flags.join(members.withColumn("is_member", lit(true)), Seq("event_id"), "left")
      .agg(count(lit(1)).as("n_probed"),
        sum(when(col("maybe_member"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("is_member").isNotNull, 1L).otherwise(0L)).as("n_members"),
        sum(when(col("maybe_member") && col("is_member").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
  }

  private val bl1Sql =
    """WITH m AS (SELECT DISTINCT event_id FROM events WHERE event_type = 'purchase'),
      |bits AS (
      |  SELECT p // 32 AS word, bit_or((1::BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
      |  FROM (SELECT ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 16384 AS p
      |        FROM m, range(0, 3) t(r))
      |  GROUP BY 1),
      |probes AS (SELECT DISTINCT event_id FROM events WHERE event_id < 5000),
      |pb AS (
      |  SELECT event_id, r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 16384 AS p
      |  FROM probes, range(0, 3) t(r)),
      |flags AS (
      |  SELECT pb.event_id,
      |    (SUM(CASE WHEN ((bits >> CAST(pb.p % 32 AS INTEGER)) & 1) = 1
      |              THEN 1 ELSE 0 END) = 3) AS maybe
      |  FROM pb LEFT JOIN bits ON pb.p // 32 = bits.word
      |  GROUP BY pb.event_id)
      |SELECT COUNT(*) AS n_probed,
      |  CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(CASE WHEN m.event_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
      |  CAST(SUM(CASE WHEN maybe AND m.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
      |FROM flags LEFT JOIN m ON flags.event_id = m.event_id""".stripMargin

  // ---- AN1: z-score outliers ---------------------------------------------
  private def an1Outliers(s: SparkSession, dir: String): DataFrame =
    Stats.zOutliers(Tables.load(s, dir, "events"), "event_type", "value",
        zThresh = 3.0, scale = 1000L)
      .orderBy(col("event_type"))

  private val an1Sql =
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(floor(CAST(value AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
      |  FROM events),
      |st AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(q) AS BIGINT) AS qsum, CAST(SUM(q * q) AS BIGINT) AS qsq
      |  FROM q GROUP BY event_type),
      |s2 AS (
      |  SELECT event_type, n,
      |    CAST(qsum AS DOUBLE) / n / 1000.0 AS mean,
      |    sqrt((CAST(qsq AS DOUBLE) / n
      |          - (CAST(qsum AS DOUBLE) / n) * (CAST(qsum AS DOUBLE) / n)) / 1000000.0) AS sd
      |  FROM st)
      |SELECT q.event_type, s2.n,
      |  CAST(SUM(CASE WHEN (CASE WHEN sd = 0 THEN 0.0
      |                           ELSE abs((CAST(q AS DOUBLE) / 1000.0 - mean) / sd) END) > 3.0
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  floor(MAX(CASE WHEN sd = 0 THEN 0.0
      |                 ELSE abs((CAST(q AS DOUBLE) / 1000.0 - mean) / sd) END)
      |        * 1000000.0 + 0.5) / 1000000.0 AS max_absz6
      |FROM q JOIN s2 USING (event_type)
      |GROUP BY q.event_type, s2.n
      |ORDER BY event_type""".stripMargin

  // ---- MAD1: robust median/MAD outliers ----------------------------------
  // The heavy-tail-safe counterpart of an1: medians instead of moments.
  // Values quantize to 10⁻³ fixed point first so both engines
  // interpolate integer-valued doubles (exact at p=0.5 — the
  // interpolation fraction is 0 or exactly 0.5), making the unrounded
  // median/MAD and every threshold comparison bit-identical.
  private def mad1Outliers(s: SparkSession, dir: String): DataFrame =
    Stats.madOutliers(Tables.load(s, dir, "events"), "event_type", "value",
        cut = 3.0, scale = 1000L)
      .orderBy(col("event_type"))

  private val mad1Sql =
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(floor(CAST(value AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
      |  FROM events),
      |m AS (SELECT event_type, COUNT(*) AS n, quantile_cont(q, 0.5) AS med
      |      FROM q GROUP BY event_type),
      |d AS (SELECT q.event_type, abs(q.q - med) AS adev
      |      FROM q JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |       FROM d GROUP BY event_type)
      |SELECT d.event_type AS event_type, m.n AS n,
      |  med / 1000.0 AS med, mad / 1000.0 AS mad,
      |  CAST(SUM(CASE WHEN adev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN m USING (event_type) JOIN md USING (event_type)
      |GROUP BY d.event_type, m.n, med, mad
      |ORDER BY event_type""".stripMargin

  // ---- PF1: per-column profile -------------------------------------------
  // One-scan null/distinct profile of the events table. The oracle
  // restates ts-distinct through the same ns→µs truncation Tables.load
  // applies (epoch_ns // 1000), so both engines count the same values.
  private def pf1Profile(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.profile(Tables.load(s, dir, "events"),
      Seq("event_id", "event_type", "ts", "user_id", "value"))
      .orderBy(col("col_name"))

  private val pf1Sql =
    """SELECT * FROM (
      |  SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
      |    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |    COUNT(DISTINCT event_id) AS n_distinct FROM events
      |  UNION ALL
      |  SELECT 'event_type', COUNT(*),
      |    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(DISTINCT event_type) FROM events
      |  UNION ALL
      |  SELECT 'ts', COUNT(*),
      |    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(DISTINCT epoch_ns(ts) // 1000) FROM events
      |  UNION ALL
      |  SELECT 'user_id', COUNT(*),
      |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(DISTINCT user_id) FROM events
      |  UNION ALL
      |  SELECT 'value', COUNT(*),
      |    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    COUNT(DISTINCT value) FROM events)
      |ORDER BY col_name""".stripMargin

  // ---- HG1: equal-width histogram ----------------------------------------
  private def hg1Histogram(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.histogram(Tables.load(s, dir, "orders"), "o_totalprice", 20)
      .orderBy(col("bin"))

  private val hg1Sql =
    """WITH mm AS (SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS lo,
      |                   MAX(CAST(o_totalprice AS DOUBLE)) AS hi FROM orders)
      |SELECT bin, COUNT(*) AS n FROM (
      |  SELECT CASE WHEN hi = lo THEN 0
      |    ELSE CAST(least(floor((CAST(o_totalprice AS DOUBLE) - lo)
      |                          / ((hi - lo) / 20)), 19) AS BIGINT) END AS bin
      |  FROM orders, mm)
      |GROUP BY bin ORDER BY bin""".stripMargin

  // ---- CM2/BL2: sketch merges (cell-add / bit-union) ---------------------
  // Disjoint slices sketched independently then merged must equal the
  // one-pass sketch — certified by reusing cm1/bl1's own oracles.
  private def cm2MergedCountMin(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    def toks(d: DataFrame) = d.select(explode(
      graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
    val table = Sketches.countMinMerge(
      Sketches.countMinTable(toks(docs.filter(col("source") < "src2")), col("token"), d = 4, w = 64),
      Sketches.countMinTable(toks(docs.filter(col("source") >= "src2")), col("token"), d = 4, w = 64))
    val top10 = TextQuality.vocabTopK(docs, "text", 10)
    Sketches.countMinEstimate(table, top10.select("token"), "token", d = 4, w = 64)
      .join(top10, Seq("token"))
      .select(col("rank").cast("long"), col("token"), col("n"), col("cm_estimate"))
      .orderBy(col("rank"))
  }

  private def bl2MergedBloom(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val members = ev.filter(col("event_type") === "purchase")
      .select(col("event_id")).distinct()
    val filter = Sketches.bloomMerge(
      Sketches.bloomBuild(members.filter(col("event_id") % 2 === 0), col("event_id"), mBits = 16384, k = 3),
      Sketches.bloomBuild(members.filter(col("event_id") % 2 =!= 0), col("event_id"), mBits = 16384, k = 3))
    val probes = ev.filter(col("event_id") < 5000).select(col("event_id")).distinct()
    val flags = Sketches.bloomProbe(filter, probes, "event_id", mBits = 16384, k = 3)
    flags.join(members.withColumn("is_member", lit(true)), Seq("event_id"), "left")
      .agg(count(lit(1)).as("n_probed"),
        sum(when(col("maybe_member"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("is_member").isNotNull, 1L).otherwise(0L)).as("n_members"),
        sum(when(col("maybe_member") && col("is_member").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
  }

  // ---- HLL2: grouped sketches + merge ------------------------------------
  // The property that makes HLL matter at 100 TB: per-event_type
  // register tables (built independently, e.g. per partition or per
  // day) merge by bucket-wise max into EXACTLY the sketch a direct
  // global pass builds — so hll1's own oracle certifies the merged
  // path bit-for-bit.
  private def hll2MergedSketch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val exact = ev.agg(count_distinct(col("event_id")).as("n_exact"))
    Sketches.hllMergedDistinct(ev, col("event_type"), col("event_id"))
      .crossJoin(broadcast(exact))
      .select(col("n_exact"), col("hll_estimate"), col("buckets_used"), col("max_register"))
  }

  // ---- QS1: mergeable binned-quantile sketch -----------------------------
  // The fourth standard sketch (HLL / count-min / Bloom / quantiles):
  // fixed-width bin counts merge by addition across any partitioning;
  // a quantile reads the upper bound of the first bin reaching p·N.
  // The oracle restates binning, the cumulative scan and the p·N pick.
  private def qs1BinQuantiles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.binQuantiles(Tables.load(s, dir, "orders"),
        "o_totalprice", width = 1000.0, ps = Seq(0.5, 0.9, 0.99))
      .orderBy(col("p"))

  private val qs1Sql =
    """WITH b AS (SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 1000.0) AS BIGINT) AS bin,
      |                  COUNT(*) AS c
      |           FROM orders GROUP BY 1),
      |n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM b),
      |cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum FROM b),
      |ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p)
      |SELECT p, CAST(MIN(bin) + 1 AS DOUBLE) * 1000.0 AS estimate
      |FROM ps, cum, n WHERE cum >= p * n GROUP BY p ORDER BY p""".stripMargin

  // ---- KM1: KMV distinct sketch per group --------------------------------
  // Distinct user-days per event type via the k-minimum-values sketch
  // (k=256): the exchange carries ≤2k-row bounded partials (MinK
  // aggregator), never the distinct set. Exact counts ride along as
  // the accuracy reference; at sf0.001 the sets are smaller than k so
  // the exact branch of the estimator is exercised there, the
  // (k−1)·2⁶⁰/θ branch at sf0.01+ — both engine-reproducible.
  private val kmvK = 256

  private def kmElements(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(col("event_type"),
      concat_ws("|", col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd")).as("e"))

  private def km1KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val el = kmElements(s, dir)
    val exact = el.groupBy(col("event_type"))
      .agg(count_distinct(col("e")).as("n_exact"))
    Sketches.kmvGroupedSketch(el, col("event_type"), col("e"), kmvK)
      .withColumnRenamed("g", "event_type")
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        Sketches.kmvEstimate(col("kmv"), kmvK).as("kmv_estimate"),
        size(col("kmv")).cast("long").as("sketch_size"))
      .orderBy(col("event_type"))
  }

  private val km1Sql =
    """WITH el AS (
      |  SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT AS h
      |  FROM events),
      |rk AS (SELECT event_type, h,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      |       FROM el),
      |sk AS (SELECT event_type, COUNT(*) AS sk_size, MAX(h) AS kth
      |       FROM rk WHERE r <= 256 GROUP BY event_type),
      |ex AS (SELECT event_type, COUNT(*) AS n_exact FROM el GROUP BY event_type)
      |SELECT ex.event_type, n_exact,
      |  CASE WHEN sk_size < 256 THEN CAST(sk_size AS DOUBLE)
      |       ELSE floor(255.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)
      |              * 1000000.0 + 0.5) / 1000000.0 END AS kmv_estimate,
      |  CAST(sk_size AS BIGINT) AS sketch_size
      |FROM ex JOIN sk ON ex.event_type = sk.event_type
      |ORDER BY ex.event_type""".stripMargin

  // ---- KM2: theta-sketch set intersection --------------------------------
  // The capability HLL registers cannot provide: a distinct-set
  // INTERSECTION estimate from two constant-size sketches — "users
  // active in A and B" without re-reading either side. θ = min of the
  // two kth minima; estimate = |common below θ|·2⁶⁰/θ. The exact
  // intersection rides along, certifying the estimate's error is the
  // sketch's, not a bug's.
  private def km2ThetaIntersection(s: SparkSession, dir: String): DataFrame = {
    val el = kmElements(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
    val sk = Sketches.kmvGroupedSketch(el, col("event_type"), col("e"), kmvK)
    val a = sk.filter(col("g") === "click").select(col("kmv").as("ka"))
    val b = sk.filter(col("g") === "purchase").select(col("kmv").as("kb"))
    val ea = el.filter(col("event_type") === "click").select(col("e")).distinct()
    val eb = el.filter(col("event_type") === "purchase").select(col("e")).distinct()
    val exact = ea.join(eb, Seq("e"), "left_semi")
      .agg(count(lit(1)).as("n_exact_common"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(exact))
      .select(col("n_exact_common"),
        Sketches.thetaIntersect(col("ka"), col("kb"), kmvK).as("theta_estimate"))
  }

  private val km2Sql =
    """WITH ela AS (
      |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT AS h
      |  FROM events WHERE event_type = 'click'),
      |elb AS (
      |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT AS h
      |  FROM events WHERE event_type = 'purchase'),
      |ska AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM ela) WHERE r <= 256),
      |skb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM elb) WHERE r <= 256),
      |th AS (SELECT least(
      |    CASE WHEN (SELECT COUNT(*) FROM ska) < 256 THEN 1152921504606846976 ELSE (SELECT MAX(h) FROM ska) END,
      |    CASE WHEN (SELECT COUNT(*) FROM skb) < 256 THEN 1152921504606846976 ELSE (SELECT MAX(h) FROM skb) END) AS t),
      |common AS (SELECT COUNT(*) AS c FROM ska JOIN skb USING (h) CROSS JOIN th WHERE h < t),
      |exact AS (SELECT COUNT(*) AS n_exact_common FROM ela JOIN elb USING (h))
      |SELECT n_exact_common,
      |  floor(CAST(c AS DOUBLE) * 1152921504606846976.0 / CAST(t AS DOUBLE)
      |    * 1000000.0 + 0.5) / 1000000.0 AS theta_estimate
      |FROM exact CROSS JOIN common CROSS JOIN th""".stripMargin

  // ---- JE1: sketch-based join-size estimation ----------------------------
  // Two constant-size count-min tables (one per table, mergeable per
  // ingest slice) answer |orders ⋈ lineitem| without touching either
  // table — the inner-product upper bound a cost-based planner
  // consults. The exact join size rides along as the accuracy
  // reference; both are exact integers, so the row hash-matches.
  private def je1JoinSize(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val ta = Sketches.countMinTable(o, col("o_orderkey"), d = 4, w = 8192)
    val tb = Sketches.countMinTable(l, col("l_orderkey"), d = 4, w = 8192)
    val exact = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .agg(count(lit(1)).as("exact_join_size"))
    Sketches.countMinJoinSize(ta, tb)
      .crossJoin(broadcast(exact))
      .select(col("exact_join_size"), col("cm_join_estimate"))
  }

  private val je1Sql =
    """WITH co AS (
      |  SELECT r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 8192 AS bucket,
      |    COUNT(*) AS c
      |  FROM orders, range(0, 4) t(r) GROUP BY 1, 2),
      |cl AS (
      |  SELECT r,
      |    ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT % 8192 AS bucket,
      |    COUNT(*) AS c
      |  FROM lineitem, range(0, 4) t(r) GROUP BY 1, 2),
      |dots AS (
      |  SELECT co.r, SUM(co.c * cl.c) AS dot
      |  FROM co JOIN cl ON co.r = cl.r AND co.bucket = cl.bucket
      |  GROUP BY co.r),
      |-- LEFT JOIN from range so a hash row with ZERO overlapping
      |-- buckets contributes dot = 0 (mirrors the engine's left join +
      |-- coalesce in countMinJoinSize; an inner-join-only MIN would
      |-- overestimate on sparse/disjoint-key data)
      |alld AS (
      |  SELECT t.r, COALESCE(dots.dot, 0) AS dot
      |  FROM range(0, 4) t(r) LEFT JOIN dots ON dots.r = t.r)
      |SELECT
      |  (SELECT COUNT(*) FROM orders o JOIN lineitem l
      |     ON o.o_orderkey = l.l_orderkey) AS exact_join_size,
      |  CAST(COALESCE(MIN(dot), 0) AS BIGINT) AS cm_join_estimate
      |FROM alld""".stripMargin

  // ---- COV1: embedding covariance matrix ---------------------------------
  // The PCA/whitening sufficient statistic: upper-triangle cov(i,j)
  // over the 64 embedding dims, exact integer sufficient statistics
  // through the shuffle (≤ d²/2 rows per partition partial-agg'd
  // map-side), one fixed IEEE division sequence at the end.
  private def cov1Covariance(s: SparkSession, dir: String): DataFrame =
    Embeddings.covarianceMatrix(Tables.load(s, dir, "embeddings"), "embedding")
      .orderBy(col("i"), col("j"))

  private val cov1Sql =
    """WITH p AS (
      |  SELECT i, j,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qi,
      |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qj
      |  FROM embeddings, range(1, 65) t(i), range(1, 65) u(j)
      |  WHERE j >= i),
      |a AS (
      |  SELECT i, j, COUNT(*) AS n, CAST(SUM(qi) AS BIGINT) AS si,
      |    CAST(SUM(qj) AS BIGINT) AS sj, CAST(SUM(qi * qj) AS BIGINT) AS sij
      |  FROM p GROUP BY i, j)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |  floor((CAST(sij AS DOUBLE) / n
      |         - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n))
      |        / 1000000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS cov6
      |FROM a ORDER BY i, j""".stripMargin

  // ---- HH1: exact heavy hitters via bounded Misra-Gries candidates ------
  // Pass 1 exchanges ≤k-entry Misra-Gries partials (guaranteed superset
  // of everything above n/(k+1)); pass 2 counts only the candidates
  // exactly. Result is identical to the direct GROUP BY + HAVING — but
  // no stage ever groups the full value domain, the shape that survives
  // a column with billions of distinct values.
  private def hh1HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    Sketches.heavyHittersExact(ev, col("user_id"), phiBp = 75, k = 256)
      .orderBy(col("cnt").desc, col("v"))
  }

  private val hh1Sql =
    """SELECT CAST(user_id AS VARCHAR) AS v, COUNT(*) AS cnt
      |FROM events GROUP BY user_id
      |HAVING COUNT(*) * 10000 > (SELECT COUNT(*) FROM events) * 75
      |ORDER BY cnt DESC, v""".stripMargin

  // ---- PCA1: top principal component by power iteration -------------------
  // The PCA/whitening direction from cov1's sufficient statistics: one
  // corpus pass builds the covariance, then three fixed-point power
  // iterations run on constant-size tables. Integer matrix-vector sums
  // + correctly-rounded sqrt/divisions make an ITERATIVE eigensolver
  // hash-matchable — the oracle unrolls the three iterations as CTEs.
  private def pca1TopPc(s: SparkSession, dir: String): DataFrame =
    Embeddings.topPcPowerIteration(
      Tables.load(s, dir, "embeddings"), "embedding", dims = 64)

  private val pca1Sql = {
    val cov =
      """p AS (
        |  SELECT i, j,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qi,
        |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qj
        |  FROM embeddings, range(1, 65) t(i), range(1, 65) u(j)
        |  WHERE j >= i),
        |a AS (
        |  SELECT i, j, COUNT(*) AS n, CAST(SUM(qi) AS BIGINT) AS si,
        |    CAST(SUM(qj) AS BIGINT) AS sj, CAST(SUM(qi * qj) AS BIGINT) AS sij
        |  FROM p GROUP BY i, j),
        |tri AS (
        |  SELECT i, j,
        |    CAST(floor((CAST(sij AS DOUBLE) / n
        |      - (CAST(si AS DOUBLE) / n) * (CAST(sj AS DOUBLE) / n))
        |      / 1000000000000.0 * 1000000.0 + 0.5) AS BIGINT) AS c6
        |  FROM a),
        |f AS (SELECT i, j, c6 FROM tri
        |      UNION ALL SELECT j AS i, i AS j, c6 FROM tri WHERE i <> j),
        |v0 AS (SELECT range AS j, CAST(125000 AS BIGINT) AS v6 FROM range(1, 65))""".stripMargin
    val its = (1 to 3).map { k =>
      s"""w$k AS (
        |  SELECT f.i AS i,
        |    CAST(floor(CAST(SUM(f.c6 * v.v6) AS DOUBLE) / 1000000.0) AS BIGINT) AS w6
        |  FROM f JOIN v${k - 1} v ON f.j = v.j GROUP BY f.i),
        |n$k AS (SELECT sqrt(CAST(SUM(w6 * w6) AS DOUBLE)) AS nrm FROM w$k),
        |v$k AS (
        |  SELECT i AS j,
        |    CAST(floor(CAST(w6 AS DOUBLE) * 1000000.0 / nrm + 0.5) AS BIGINT) AS v6
        |  FROM w$k, n$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $cov,
      |$its
      |SELECT v.j AS dim, CAST(v6 AS DOUBLE) / 1000000.0 AS pc6,
      |  floor(nrm + 0.5) / 1000000.0 AS lambda6
      |FROM v3 v, n3 ORDER BY dim""".stripMargin
  }

  // ---- BFJ1: Bloom-pruned selective join -----------------------------------
  // The runtime-filter posture: a constant-size Bloom filter over the
  // FILTERED dim's keys prunes the fact before the join's shuffle — at
  // 100 TB the exchange carries the matching sliver (+ the removable
  // false-positive sliver) instead of the whole fact. The oracle is the
  // PLAIN join: pruning must be invisible in the result.
  private def bfj1BloomJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val fact = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"),
        col("l_extendedprice"), col("l_discount"))
    val dim = Tables.load(s, dir, "part").filter(col("p_size") === 1)
      .select(col("p_partkey"), col("p_brand"))
    graft.ops.Skew.bloomPrunedJoin(fact, dim, "p_partkey", mBits = 1 << 16)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("p_brand"))
  }

  private val bfj1Sql =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 1
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  override def all: Seq[Q] = Seq(
    Q("bfj1_bloom_pruned_join", "Bloom-pruned selective fact⋈dim join (constant-size runtime filter ahead of the shuffle; result ≡ plain join)", bfj1BloomJoin, Some(bfj1Sql)),
    Q("pca1_power_iteration", "top principal component via fixed-point power iteration over the covariance sufficient statistics (one corpus pass; iterations on constant-size tables)", pca1TopPc, Some(pca1Sql)),
    Q("cov1_embedding_covariance", "upper-triangle embedding covariance matrix (PCA/whitening prep, exact fixed-point sufficient statistics)", cov1Covariance, Some(cov1Sql)),
    Q("je1_joinsize_estimate", "join-cardinality estimate from two count-min sketches (inner-product upper bound) vs exact", je1JoinSize, Some(je1Sql)),
    Q("hh1_heavy_hitters", "exact heavy hitters: Misra-Gries bounded candidate pass + exact second pass", hh1HeavyHitters, Some(hh1Sql)),
    Q("km1_kmv_distinct", "KMV distinct sketch per group (bounded k-minimum-values aggregator)", km1KmvDistinct, Some(km1Sql)),
    Q("km2_theta_intersection", "theta-sketch distinct-set INTERSECTION estimate (what HLL can't do)", km2ThetaIntersection, Some(km2Sql)),
    Q("qs1_bin_quantiles", "mergeable binned-quantile sketch (p50/p90/p99 from additive bin counts)", qs1BinQuantiles, Some(qs1Sql)),
    Q("pf1_column_profile", "one-scan per-column null/distinct profile", pf1Profile, Some(pf1Sql)),
    Q("hg1_histogram", "equal-width 20-bin histogram over order totals", hg1Histogram, Some(hg1Sql)),
    Q("cm1_countmin", "count-min sketch table + top-10 vocabulary probe (md5 rows, exact-integer cells)", cm1CountMin, Some(cm1Sql)),
    Q("bl1_bloom", "Bloom filter build + probe with deterministic false-positive band", bl1Bloom, Some(bl1Sql)),
    Q("an1_z_outliers", "per-group z-score outlier counts (fixed-point moments; sqrt is correctly-rounded IEEE)", an1Outliers, Some(an1Sql)),
    Q("mad1_robust_outliers", "per-group median/MAD robust outlier counts (exact fixed-point medians)", mad1Outliers, Some(mad1Sql)),
    Q("hll1_distinct_sketch", "deterministic HyperLogLog-256 cardinality estimate (md5 registers, exact-integer register sum)", hll1Sketch, Some(hll1Sql)),
    Q("hll2_merged_sketch", "per-group HLL register tables merged by bucket-wise max == direct sketch", hll2MergedSketch, Some(hll1Sql)),
    Q("hll3_grouped_estimates", "one HLL estimate per group (distinct users per segment at sketch cost)", hll3GroupedSketch, Some(hll3Sql)),
    Q("cm2_merged_countmin", "per-slice count-min tables merged by cell-wise add == direct table", cm2MergedCountMin, Some(cm1Sql)),
    Q("bl2_merged_bloom", "per-slice Bloom filters merged by bit union == direct filter", bl2MergedBloom, Some(bl1Sql)),
    Q("qz1_quantize_int8", "symmetric int8 embedding quantization digest", qz1Quantize, Some(qz1Sql)),
    Q("dim1_dim_stats", "per-dimension embedding mean/variance in overflow-safe fixed-point", dim1DimStats, Some(dim1Sql)))
}
