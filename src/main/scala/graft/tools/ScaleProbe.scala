package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Graph}

/** Empirical scaling-exponent probe for the pair/graph family
  * (dd2 MinHash-LSH pairs, pj1 exact prefix-filtered Jaccard join,
  * cc1 alternating-star components, tr1 degree-ordered triangles).
  *
  * sf0.1 correctness runs cannot DISTINGUISH a banded/O(m^1.5) plan
  * from a quadratic one — both finish in seconds. This probe can: it
  * synthesizes a clustered near-dup corpus whose true pair count grows
  * LINEARLY in n (fixed-size clusters of 4 mutually-near-dup docs, so
  * pairs = 1.5n, triangles = n), times each operator at n and 4n, and
  * reports the measured exponent log4(t₄ₙ/tₙ). A banded/linear plan
  * reads ≲1.3 (fixed costs drag it below 1); a quadratic candidate
  * stage reads ≈2. Results are recorded in PLANS.md per round 9.
  *
  * Corpus: doc id belongs to cluster id/4; each doc is 40 cluster-
  * scoped tokens with ONE variant-specific position mutated, so
  * within-cluster Jaccard = 38/42 ≈ 0.905 (≥ the 0.9 threshold) and
  * cross-cluster similarity is 0 — the density knob stays fixed as n
  * grows, which is what makes the exponent attributable to the PLAN.
  */
object ScaleProbe {

  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id",
      "array_join(transform(sequence(0, 39), w -> concat('c', cast(id div 4 as string), '_', " +
        "cast(CASE WHEN w = (id % 4) * 7 THEN 9999 + id % 4 ELSE w END as string))), ' ') AS text")

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val small = args.headOption.map(_.toLong).getOrElse(3000L)
    val factor = 4L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_SCALE_ONLY=emb,band,bloom,line,pairs (comma list) runs a
    // subset — the full sweep is ~15 min, and re-measuring ONE family
    // at a larger n (the round-9 "flat readings can be pure fixed
    // cost" lesson) shouldn't pay for the rest
    val only = sys.env.get("GRAFT_SCALE_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def want(group: String): Boolean = only.forall(_.contains(group))

    def ops(docs: DataFrame): Seq[(String, () => Long)] = {
      // EAGER, outside any timed thunk: cc1/tr1 must measure their own
      // scaling, not free-ride on (or get charged for) the pair
      // generation that dd2 already measures separately
      val pairs = Dedup.minHashNearDupPairs(docs, "id", "text",
        threshold = 0.9).localCheckpoint(true)
      Seq(
        "dd2_minhash_pairs" -> (() =>
          Dedup.minHashNearDupPairs(docs, "id", "text", threshold = 0.9).count()),
        "pj1_prefix_jaccard" -> (() =>
          Dedup.prefixJaccardPairs(docs, "id", "text", threshold = 0.9).count()),
        "cc1_star_components" -> (() =>
          Dedup.alternatingStarComponents(pairs, docs.select(col("id")), "id").count()),
        "tr1_triangles" -> (() => Graph.triangleCounts(pairs).count()),
        // linear-in-|E| claim: 3 rounds of keyed joins over the 1.5n pairs
        "lp1_label_communities" -> (() =>
          Graph.labelPropagation(pairs, rounds = 3).count()),
        // word-count shapes + one data-sized token join; labels id%5 so
        // |classes| stays constant while vocab and tokens grow with n
        "cl1_class_lift" -> (() => {
          val labeled = docs.withColumn("lang",
            concat(lit("l"), pmod(col("id"), lit(5)).cast("string")))
          val model = graft.ops.TextQuality.trainClassLift(
            labeled.filter(pmod(col("id"), lit(10)) =!= 0), "lang", "text")
          graft.ops.TextQuality.classifyByLift(model,
            labeled.filter(pmod(col("id"), lit(10)) === 0), "id", "text").count()
        }))
    }

    val lines = if (!want("pairs")) Seq.empty[String] else {
      // JIT/codegen warmup on a tiny corpus, untimed
      ops(corpus(spark, 400).localCheckpoint(true)).foreach(_._2())
      val results = Seq(small, small * factor).map { n =>
        val docs = corpus(spark, n).localCheckpoint(true)
        n -> ops(docs).map { case (name, f) =>
          val (secs, rows) = timed(f())
          (name, secs, rows)
        }
      }
      val Seq((n1, r1), (n2, r2)) = results
      r1.zip(r2).map { case ((name, t1, c1), (_, t2, c2)) =>
        val exp = math.log(t2 / t1) / math.log(factor.toDouble)
        f""""$name":{"t_$n1%d":$t1%.2f,"t_$n2%d":$t2%.2f,"rows_$n1%d":$c1,"rows_$n2%d":$c2,"exponent":$exp%.2f}"""
      }
    }

    val embLines =
      if (want("emb")) embeddingExponents(spark, small, factor) else Seq.empty
    val bandLines =
      if (want("band")) hashBandExponents(spark, small * 10, factor) else Seq.empty
    val bloomLines =
      if (want("bloom")) bloomJoinExponents(spark, small * 400, factor) else Seq.empty
    val lineLines =
      if (want("line")) lineDedupExponents(spark, small * 100, factor) else Seq.empty
    val budgetLines =
      if (want("budget")) budgetCutExponents(spark, small * 300, factor) else Seq.empty
    val segLines =
      if (want("seg")) segmentExponents(spark, small * 2, factor) else Seq.empty
    println("{" + (lines ++ embLines ++ bandLines ++ bloomLines
      ++ lineLines ++ budgetLines ++ segLines).mkString(",") + "}")
    spark.stop()
  }

  /** mm9's segment near-dup under pair-planted density: clips come in
    * near-identical PAIRS (wavPairSample keys content by doc_id / 2),
    * so frames, segments, fingerprints, candidate collisions and the
    * output pair set all grow linearly in n — the exponent is
    * attributable to the plan, and a candidate join that lost the
    * fingerprint block (all-pairs) reads ≈2. The clips are REAL WAV
    * round-trips (encode + AudioSystem decode per clip), so the probe
    * also certifies the mapPartitions codec seam stays linear.
    */
  /** Probe-local clip synth: [[graft.ops.Multimodal.wavPairSample]]'s
    * pair structure with the base content NONLINEARLY mixed per group.
    * The query's sampleFn is linear in g modulo 2001 (it must stay
    * DuckDB-restatable), so groups g and g+2001 carry IDENTICAL audio —
    * fine at oracle scale (≤250 groups), but at probe scale the content
    * space saturates and the TRUE pair count superlinearizes by
    * construction (measured 12× rows at 4× docs), which would charge
    * the plan for the fixture. Any v = f(g) + h(i) mod 2001 keeps the
    * aliasing (a group only shifts the sample additively), so the mix
    * must be JOINTLY nonlinear in (g, i) — a splitmix64 finalizer over
    * the sample's absolute index. Truth then stays linear: pairs only
    * within planted groups.
    */
  private def probePairSample(id: Long, i: Int): Int = {
    val g = id / 2
    val f = i / 160
    if ((g + f) % 5 == 0) 0
    else if (f == (id % 2) * 3 + 2)
      (((id * 13 + i.toLong * 11) % 2001) - 1000).toInt
    else {
      var x = g * 1600L + i + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^= (x >>> 31)
      (Math.floorMod(x, 2001L) - 1000L).toInt
    }
  }

  private def segmentExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    import graft.ops.Multimodal
    def run(n: Long): (Double, Long) = {
      val docs = spark.range(n).select(col("id").as("doc_id"))
      def pairs() = {
        val frames = Multimodal.wavFrameFeatures(
          Multimodal.wavTable(docs, nSamples = 1600,
            sampleFn = (id, i) => probePairSample(id, i)))
          .localCheckpoint(true)
        val segs = Multimodal.energySegments(frames, threshold = 0L, minFrames = 2)
        Multimodal.segmentNearDupPairs(frames, segs, minJaccard6 = 500000L)
          .count()
      }
      val a = timed(pairs())
      val b = timed(pairs())
      (math.min(a._1, b._1), a._2)
    }
    run(400) // untimed codegen/codec warmup
    val (t1, c1) = run(small)
    val (t2, c2) = run(small * factor)
    val exp = math.log(t2 / t1) / math.log(factor.toDouble)
    Seq(f""""mm9_segment_near_dup":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}""")
  }

  /** tb1's token-budget cut under a DOMINANT source: half the corpus
    * in one source, the rest spread over √n sources — the exact shape
    * that serializes a per-source window into one task. The claim is
    * the grouped zipWithIndex scheme's linearity: one range exchange,
    * pid-bounded local windows, an O(P + G) offset table. Budgets are
    * sized so every source truncates (the filter binds). A plan that
    * fell back to a per-source window would show the dominant source's
    * task as a serial bottleneck — super-linear wall here.
    */
  private def budgetCutExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    import graft.ops.{Packing, Ranking => _}
    def docs(n: Long): DataFrame =
      spark.range(n).selectExpr("id",
        "CASE WHEN id % 2 = 0 THEN 'big' ELSE concat('s', cast(pmod(hash(id), cast(sqrt(cast(id as double)) as long) + 1) as string)) END AS source",
        "10 + id % 90 AS n_tokens")
    def run(n: Long): (Double, Long) = {
      // docs NOT checkpointed: generation is three narrow exprs over
      // range() — a pinned 72M-row fixture would stack on the op's own
      // checkpoint and measure single-JVM storage pressure, not the plan
      val d = docs(n)
      val budgets = d.select(col("source")).distinct()
        .select(col("source"), lit(5000L).as("budget"))
        .localCheckpoint(true)
      val a = timed(Packing.tokenBudgetCut(d, "source", "n_tokens",
        Seq(col("id")), budgets).count())
      val b = timed(Packing.tokenBudgetCut(d, "source", "n_tokens",
        Seq(col("id")), budgets).count())
      (math.min(a._1, b._1), a._2)
    }
    run(2000) // untimed codegen warmup
    val (t1, c1) = run(small)
    val (t2, c2) = run(small * factor)
    val exp = math.log(t2 / t1) / math.log(factor.toDouble)
    Seq(f""""tb1_token_budget_cut":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}""")
  }

  /** ld1's line dedup under fixed boilerplate density: every doc is 12
    * lines — 10 doc-unique + 2 banners from a CONSTANT 50-banner pool —
    * so dup-line occurrences grow exactly linearly (2n) and unique
    * lines 10n. The claim is the word-count shape: one groupBy(line)
    * with map-side partials + one hash join + a per-doc-bounded
    * reassembly, linear in total lines; a plan that grouped per-doc
    * line ARRAYS through the exchange or lost the partial aggregation
    * would read super-linear here.
    */
  private def lineDedupExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    def docs(n: Long): DataFrame =
      spark.range(n).selectExpr("id AS doc_id",
        "concat('BANNER_', cast(id % 50 as string), '\\n', " +
          "array_join(transform(sequence(0, 9), " +
          "l -> concat('u', cast(id as string), '_', cast(l as string))), '\\n'), " +
          "'\\nBANNER_', cast((id + 17) % 50 as string)) AS text")
    def run(n: Long): (Double, Long) = {
      val d = docs(n).localCheckpoint(true)
      val a = timed(Dedup.lineDedup(d, "doc_id", "text").count())
      val b = timed(Dedup.lineDedup(d, "doc_id", "text").count())
      (math.min(a._1, b._1), a._2)
    }
    run(2000) // untimed codegen warmup
    val (t1, c1) = run(small)
    val (t2, c2) = run(small * factor)
    val exp = math.log(t2 / t1) / math.log(factor.toDouble)
    Seq(f""""ld1_line_dedup":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}""")
  }

  /** mm7's Hamming-band probe under its SERVE posture (fixed probe set
    * vs a growing corpus): clusters of 4 hashes within distance ≤ 2
    * (base = xxhash64 of the cluster id; variant k flips bit 7k),
    * cross-cluster ≈ 32 bits apart. 64 fixed probes each match their
    * own cluster — 256 result rows at every n, so time growth is pure
    * corpus-side cost: banding explode + the broadcast-probe join,
    * linear in n. (The SELF-join posture is different: 16-bit bands
    * collide at Θ(n²/2¹⁶) once a corpus approaches 2^bandBits per
    * band — the scaladoc's wider-bands/multi-index caveat.)
    */
  private def hashBandExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    import graft.ops.Multimodal
    def hashes(n: Long): DataFrame =
      spark.range(n).selectExpr("id AS doc_id",
        """CASE WHEN id % 4 = 0 THEN xxhash64(id div 4)
          |ELSE xxhash64(id div 4) ^ shiftleft(cast(1 as bigint),
          |  cast((id % 4) * 7 as int)) END AS phash""".stripMargin)
    def run(n: Long): (Double, Long) = {
      val corpus = hashes(n).localCheckpoint(true)
      val probes = hashes(64).localCheckpoint(true)
      // min-of-2: single draws at sub-second scale measure JIT, not plan
      val a = timed(Multimodal.dHashNearDupPairs(corpus, probes, maxDist = 3).count())
      val b = timed(Multimodal.dHashNearDupPairs(corpus, probes, maxDist = 3).count())
      (math.min(a._1, b._1), a._2)
    }
    run(2000) // untimed codegen warmup
    val (t1, c1) = run(small)
    val (t2, c2) = run(small * factor)
    val exp = math.log(t2 / t1) / math.log(factor.toDouble)
    Seq(f""""mm7_band_probe":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}""")
  }

  /** bfj1's Bloom prune with the DIM HELD FIXED while the fact grows —
    * the operator's actual claim is fact-side: cost is one linear
    * codegen pass (k broadcast word joins, no exchange of the fact)
    * and the kept rows track the matching sliver. The filter must be
    * SIZED to the dim (mBits ∝ |dim keys|) — a probe that grew the dim
    * under a fixed 2²⁰-bit filter measured fp blow-up (7% of a 19.2M
    * fact passing), the production sizing rule demonstrated by its
    * violation.
    */
  private def bloomJoinExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    import graft.ops.Skew
    val dim = spark.range(small / 400).selectExpr("id * 400 AS k")
      .localCheckpoint(true)
    def run(n: Long): (Double, Long) = {
      val fact = spark.range(n).selectExpr("id AS k", "id % 97 AS payload")
        .localCheckpoint(true)
      val a = timed(Skew.bloomPruneFact(fact, dim, "k", mBits = 1 << 20, k = 4).count())
      val b = timed(Skew.bloomPruneFact(fact, dim, "k", mBits = 1 << 20, k = 4).count())
      (math.min(a._1, b._1), a._2)
    }
    run(50000) // untimed warmup
    val (t1, c1) = run(small)
    val (t2, c2) = run(small * factor)
    val exp = math.log(t2 / t1) / math.log(factor.toDouble)
    Seq(f""""bfj1_bloom_prune":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}""")
  }

  /** Clustered EMBEDDING corpus with the same fixed-density property as
    * [[corpus]]: clusters of 4 mutually-near-dup vectors (within-cluster
    * cosine ≈ 0.994 ≥ 0.9; the shared base direction is zero-centered
    * uniform per cluster, so cross-cluster cosine concentrates near 0 —
    * |cos| ≲ 3/√64 — and never crosses the threshold), true pair count
    * 1.5n, exactly linear in n.
    */
  def embCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 63), j -> pmod(hash(id div 4, j), 1000) / 1000.0 - 0.5 " +
          "+ CASE WHEN j = (id % 4) * 7 THEN 0.05 * (1 + id % 4) ELSE 0.0 END) AS e0")
      // UNIT-normalize: the engine's cosine is the raw dot product
      // (embeddings-table vectors are unit length), so an unnormalized
      // synthetic corpus would put every within-block dot at ||v||² ≈
      // 5.3 ≫ any threshold and measure the wrong semantics
      .selectExpr("vec_id", "e0",
        "sqrt(aggregate(e0, cast(0 as double), (a, y) -> a + y * y)) AS n0")
      .selectExpr("vec_id",
        "transform(e0, x -> cast(x / n0 as float)) AS embedding")

  /** The semantic family's exponents, measured under each operator's
    * documented SCALE POSTURE (the claim is sub-quadratic *given* the
    * posture, so the probe must grow the knob with n):
    *
    *  - `sd1_semdedup`: K = n/50 centroids (constant expected cluster
    *    occupancy) keeps the blocked pairwise O(n²/K) = O(n) — a fixed
    *    K would re-grow the quadratic inside each block.
    *  - `ivf_serve`: C = √n centroids, so serve cost per fixed 64-query
    *    batch is O(q·(C + nProbe·n/C)) = O(q·√n) — exponent ≈ 0.5 is
    *    the theory line, fixed costs drag the measured value below it.
    *    Build (untimed here) is one assignment pass, linear.
    */
  private def embeddingExponents(
      spark: SparkSession, small: Long, factor: Long): Seq[String] = {
    import graft.ops.Similarity
    import graft.sources.AnnIndex
    def run(n: Long): Seq[(String, Double, Long)] = {
      val vecs = embCorpus(spark, n).localCheckpoint(true)
      val queries = embCorpus(spark, 64).localCheckpoint(true)
      val table = s"graft_scaleprobe_ivf_$n"
      AnnIndex.buildIvf(vecs, table,
        nCentroids = math.max(4, math.sqrt(n.toDouble).toInt), refine = 1,
        buckets = 8)
      Seq(
        "sd1_semdedup" -> (() => Similarity.semDedup(vecs,
          nCentroids = math.max(4, (n / 50).toInt), refine = 1,
          threshold = 0.9).count()),
        // the O(n·√K) two-level assignment under the SAME K = n/50
        // posture — the fix for sd1's n·K assignment term
        "sd1_semdedup_hier" -> (() => Similarity.semDedup(vecs,
          nCentroids = math.max(4, (n / 50).toInt), refine = 1,
          threshold = 0.9, hierarchical = true).count()),
        "ivf_serve" -> (() => AnnIndex.ivfServe(spark, table, queries,
          k = 10, nProbe = 2).count())
      ).map { case (name, f) =>
        val (secs, rows) = timed(f())
        (name, secs, rows)
      }
    }
    // untimed warmup (codegen for the scoring/assignment shapes)
    run(400)
    val r1 = run(small)
    val r2 = run(small * factor)
    r1.zip(r2).map { case ((name, t1, c1), (_, t2, c2)) =>
      val exp = math.log(t2 / t1) / math.log(factor.toDouble)
      f""""$name":{"t_$small%d":$t1%.2f,"t_${small * factor}%d":$t2%.2f,"rows_$small%d":$c1,"rows_${small * factor}%d":$c2,"exponent":$exp%.2f}"""
    }
  }
}
