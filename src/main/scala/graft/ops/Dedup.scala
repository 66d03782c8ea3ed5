package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (the point of each operator):
  *  - exact: one hash-groupBy — a single shuffle on a 32-byte key, the
  *    cheapest possible full-corpus dedup at 100 TB.
  *  - MinHash+LSH: signatures are narrow map-side work; candidate
  *    generation joins on band keys so the pair space is O(collisions),
  *    never O(n²); verification runs only on banded candidates.
  *  - SimHash: pure Column DSL (array aggregates) — a narrow projection,
  *    zero shuffle until the band-key self-join.
  *  - All hashes derive from md5 prefixes so results are reproducible in
  *    any engine (and against the DuckDB oracle) — no engine-private
  *    hash functions in semantics-bearing positions.
  */
object Dedup {

  /** Scale-adaptive spread BEFORE a per-row-expensive projection
    * (round 16): a single-row-group parquet file scans as ONE task, so
    * any hash/signature kernel computed directly above it — including
    * one sitting below a later `repartition(...)`, whose exchange runs
    * AFTER the projection — serializes on one core. This helper
    * repartitions the RAW rows by `key` only when the input's actual
    * partition count is below the session's default parallelism; at
    * scale inputs arrive with abundant scan parallelism and it is a
    * no-op (the decision reads the physical partition count, not a
    * constant), so no corpus-sized payload shuffle is ever added to
    * the 100 TB plan.
    */
  private[graft] def spreadForCompute(df: DataFrame, key: Column): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(key)
  }

  /** 32-bit hash from an md5 prefix (engine-portable, deterministic).
    * Native digest-prefix read (round 15): bit-identical to
    * `conv(substring(md5(c),1,8),16,10)` without the hex-string
    * round-trip — the old form allocated the 32-char hex, substringed
    * it, and re-parsed it base-16 on every evaluation, in per-token
    * hot paths (count-min rows, span grams, bloom bits).
    */
  def hash32(c: Column): Column =
    graft.functions.ArrayHashes.md5_head_hex(c.cast("string"), 8)

  /** 60-bit hash (15 md5 hex chars) — collision-safe enough to stand in
    * for set elements in Jaccard arithmetic (p ≈ n²/2⁶¹ per pair), while
    * staying positive in a signed 64-bit value in any engine. Same
    * native digest-prefix read as [[hash32]].
    */
  def hash60(c: Column): Column =
    graft.functions.ArrayHashes.md5_head_hex(c.cast("string"), 15)

  // ---- exact dedup -------------------------------------------------------

  /** Exact duplicate groups: content hash → survivor (min id) + count.
    * Spread before the fingerprint (normalize + md5 per doc — the
    * per-row-expensive projection; see [[spreadForCompute]]).
    */
  def exactDupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    spreadForCompute(df.select(id.as("__id"), text.as("__t")), col("__id"))
      .groupBy(TextAnalysis.fingerprint(col("__t")).as("content_hash"))
      .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the minimum id per normalized-content hash. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val groups = exactDupGroups(df, col(idCol), col(textCol))
      .select(col("keep_id").as(idCol))
    df.join(groups, Seq(idCol), "left_semi")
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** K-permutation MinHash signature over distinct word shingles —
    * single-pass native expression (graft.functions.ArrayHashes), k·|words|
    * md5 evaluations per doc inside whole-stage codegen.
    */
  def minHashSignature(text: Column, k: Int): Column =
    graft.functions.ArrayHashes.minhash_signature(
      array_distinct(TextAnalysis.tokens(text)), k)

  /** LSH band keys: bands of `r` signature rows, hashed with the band
    * index so bands never collide across positions. Column-DSL form of
    * `ArrayHashes.minhash_band_keys` (same 60-bit long keys).
    */
  def lshBandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      hash60(concat_ws("|",
        lit(b) +: (0 until r).map(j => element_at(sig, b * r + j + 1)): _*))
    }: _*)

  /** Set Jaccard similarity; inputs must already be distinct element
    * arrays (array_intersect/array_union are set ops themselves, so no
    * per-pair re-dedup work is spent here — this runs once per candidate
    * pair and is the hot inner loop of every near-dup verify).
    */
  def jaccard(a: Column, b: Column): Column =
    TextAnalysis.round6(size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)))

  /** Jaccard over SORTED distinct long arrays — one-pass merge via the
    * native `jaccard_sorted` expression; ~100× cheaper per pair than the
    * generic array set ops. Use with `array_sort`ed `hash60` sets.
    */
  def jaccardSorted(a: Column, b: Column): Column =
    TextAnalysis.round6(graft.functions.ArrayHashes.jaccard_sorted(a, b))

  /** MinHash-LSH near-duplicate pairs: banded candidates verified with
    * exact Jaccard ≥ threshold. Output: (id_a, id_b, jaccard).
    *
    * Plan shape (the scale-critical part):
    *  1. signatures + hashed word sets: narrow, map-side, materialized
    *     once (eager localCheckpoint);
    *  2. ONE slim (band_pos, band_key) self-join over exploded band
    *     keys — the shuffle carries 8 short keys per doc, never the
    *     hashed word sets; each pair survives exactly once (lowest
    *     colliding band, prefix-differs filter), so no DISTINCT shuffle;
    *  3. verification joins the hashed word sets (60-bit longs, not
    *     strings) back by id — Jaccard runs once per candidate pair on
    *     integer arrays.
    * Band selectivity r = k/bands controls the candidate volume:
    * P(candidate) = 1-(1-J^r)^bands. Defaults (k=32, bands=8, r=4) put
    * the S-curve's knee near the 0.9 default threshold: recall at J=0.9
    * is 1-(1-0.9⁴)²⁸... ≈ 0.9998 while J=0.3 pairs pass at only ~6% —
    * true near-dups essentially always surface, the dissimilar mass is
    * still pruned. (The old bands=2/r=16 default missed ~66% of true
    * J=0.9 pairs — recall at the operator's own threshold is the
    * tuning invariant, asserted in DedupSpec's planted-pair test.)
    */
  def minHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.9): DataFrame =
    minHashPairsFromSignatures(minHashSignatures(df, idCol, textCol, k, bands), threshold)

  /** Stage 1 of MinHash-LSH dedup, exposed so a pipeline computing BOTH
    * the pair list and its canonicalization (or several thresholds)
    * materializes signatures exactly once. Output: (id, wh, band_keys),
    * eagerly localCheckpointed.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): DataFrame =
    // spread BEFORE the signature projection (round 16): the old
    // `.select(sig).repartition(id)` put the exchange ABOVE the
    // projection, so signature hashing of a one-row-group file still
    // ran on one core — spreadForCompute repartitions the raw rows
    // first (no-op when the scan is already parallel). The eager
    // localCheckpoint computes signatures exactly once — they feed the
    // slim band join AND both verification probes in stage 2. The
    // payload is dropped BEFORE the checkpoint on purpose: a corpus-
    // scale caller must not cache document text
    spreadForCompute(df.select(col(idCol).as("id"), col(textCol).as("__t")),
        col("id"))
      .select(
        col("id"),
        graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col("__t")), 1).as("wh"),
        graft.functions.ArrayHashes.minhash_band_keys(
          array_distinct(TextAnalysis.tokens(col("__t"))), k, bands).as("band_keys"))
      .localCheckpoint(true)

  /** [[minHashSignatures]] KEEPING the payload columns: one
    * hash-partitioned, eagerly-checkpointed frame carrying both the
    * document and its (wh, band_keys) signature. For TRIGGER-SIZED
    * batches (the streaming ingest gate) where one job materializing
    * payload + signatures replaces two checkpoint jobs per trigger —
    * corpus-scale callers use [[minHashSignatures]]'s slim projection
    * instead (document text must not enter the cache).
    */
  def withMinHashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8): DataFrame =
    // unconditional repartition BEFORE the signature projection (NOT
    // spreadForCompute: its partition-count probe materializes AQE
    // stages of a shuffled trigger batch — an extra per-trigger job,
    // caught by IngestDedupSpec's action budget). The old code paid
    // this same exchange after the projection; moving it below keeps
    // the job count and parallelizes the hashing.
    df.repartition(col(idCol))
      .withColumn("wh",
        graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col(textCol)), 1))
      .withColumn("band_keys",
        graft.functions.ArrayHashes.minhash_band_keys(
          array_distinct(TextAnalysis.tokens(col(textCol))), k, bands))
      .localCheckpoint(true)

  /** Stage 2: banded candidate generation + exact-Jaccard verification
    * over [[minHashSignatures]] output.
    */
  def minHashPairsFromSignatures(sigs: DataFrame, threshold: Double): DataFrame = {
    // ONE slim band-position join (not one join per band): explode band
    // keys WITHOUT the heavy word-hash arrays, so the band shuffle
    // carries 8 short strings per doc instead of the whole hashed word
    // set. First-colliding-band semantics (each pair produced exactly
    // once, by the lowest colliding band — no DISTINCT shuffle) are kept
    // via the prefix-differs filter on the full key arrays.
    val bandRows = sigs.select(col("id"), col("band_keys"),
      posexplode(col("band_keys")).as(Seq("band_pos", "band_key")))
    val a = bandRows.select(col("band_pos"), col("band_key"),
      col("id").as("id_a"), col("band_keys").as("bka"))
    val b = bandRows.select(col("band_pos"), col("band_key"),
      col("id").as("id_b"), col("band_keys").as("bkb"))
    val earlierAllDiffer = !graft.functions.ArrayHashes.prefix_any_equal(
      col("bka"), col("bkb"), col("band_pos"))
    val cands = a.join(b, Seq("band_pos", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .filter(earlierAllDiffer)
      .select(col("id_a"), col("id_b"))
    // verification: fetch hashed word sets by id (sigs re-read from the
    // checkpoint, not recomputed) and run the one-pass sorted merge once
    // per candidate pair
    val wa = sigs.select(col("id").as("id_a"), col("wh").as("wa"))
    val wb = sigs.select(col("id").as("id_b"), col("wh").as("wb"))
    cands.join(wa, Seq("id_a")).join(wb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("wa"), col("wb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- exact-threshold similarity join (prefix filtering) ----------------

  /** EXACT Jaccard-threshold self-join via document-frequency-ordered
    * prefix filtering (the AllPairs/PPJoin family: Bayardo et al.,
    * WWW'07; Xiao et al., WWW'08) — every pair with Jaccard ≥ t, zero
    * false negatives, without LSH's probabilistic recall and without
    * the O(n²) cross product.
    *
    * Why it prunes: fix any total order on tokens (here: global doc
    * frequency ascending, token hash tiebreak — rarest first). If
    * Jaccard(a,b) ≥ t then |a∩b| ≥ t·max(|a|,|b|), so by pigeonhole the
    * order-minimal COMMON token must sit inside both docs' first
    * |d| − ⌈t·|d|⌉ + 1 tokens. Joining only on those short prefixes
    * (rare tokens, so tiny posting lists) finds every qualifying pair;
    * everything else never meets.
    *
    * Plan shape at 100 TB:
    *  1. hashed word sets: narrow map-side work, checkpointed once
    *     (feeds both the prefix stage and verification);
    *  2. token doc-frequencies: one groupBy on the token hash (the
    *     inverted-index shuffle this package already pays for ii1);
    *  3. prefix self-join: the shuffle carries only ⌈(1−t)·|d|⌉+1
    *     rare-token postings per doc — each posting list is short by
    *     construction (rare = low df), so the candidate space is
    *     Σ df², concentrated on true near-dup clusters;
    *  4. each pair survives exactly once — kept only where the joined
    *     token IS the order-minimal common prefix token
    *     (array_intersect preserves left order) — so no DISTINCT
    *     shuffle on candidates, mirroring dd2's first-colliding-band
    *     trick;
    *  5. length filter (min ≥ t·max) discards size-incompatible pairs
    *     before the verify join; verification fetches the full sorted
    *     hash sets by id and runs the one-pass sorted-merge Jaccard
    *     once per candidate.
    *
    * Candidate generation runs with t−1e-6 slack so pairs that ROUND to
    * the threshold at 6 decimals are still generated; the final filter
    * applies the exact rounded contract (round6(J) ≥ t), matching the
    * naive-quadratic oracle bit for bit.
    */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val t = threshold - 1e-6
    // spread before the hash-set projection (see spreadForCompute — the
    // old post-projection repartition left the hashing single-core on a
    // one-row-group file)
    val sets = spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__t")), col("id"))
      .select(col("id"),
        graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col("__t")), 1).as("wh"))
      .localCheckpoint(true)
    val toks = sets.select(col("id"), explode(col("wh")).as("tok"))
    val freqs = toks.groupBy(col("tok")).agg(count(lit(1)).as("doc_freq"))
    // rebuild each doc's token array in canonical rarity order; struct
    // sort gives (doc_freq, tok) lexicographic, then project tok back out
    val ordered = toks.join(freqs, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("doc_freq"), col("tok")))).as("o"))
      .select(col("id"), transform(col("o"), x => x.getField("tok")).as("ord"),
        size(col("o")).as("n"))
    val pref = ordered.select(col("id"), col("n"),
      slice(col("ord"), lit(1),
        (col("n") - ceil(col("n") * t) + 1).cast("int")).as("prefix"))
    // Exploded prefix postings, materialized ONCE (round 16): the
    // self-join below otherwise recomputes the whole prefix pipeline —
    // token explode, doc-freq aggregate, collect_list+array_sort — per
    // side (two of each exchange in the round-15 plan). The prefix
    // array rides along for the first-common test; it is short by
    // construction (⌈(1−t)·|d|⌉+1 rare tokens — measured 2.8 longs avg
    // at sf0.1), so the bytes are immaterial next to a second build.
    val ex = pref.select(col("id"), col("n"), col("prefix"),
        posexplode(col("prefix")).as(Seq("pos", "tok")))
      .localCheckpoint(true)
    val a = ex.select(col("tok"), col("id").as("id_a"), col("n").as("na"),
      col("pos").as("posa"), col("prefix").as("pa"))
    val b = ex.select(col("tok"), col("id").as("id_b"), col("n").as("nb"),
      col("pos").as("posb"), col("prefix").as("pb"))
    // PPJoin positional filter: on the first-common-token row the pair's
    // overlap is at most 1 + what remains after each doc's match
    // position; J ≥ t needs overlap ≥ t/(1+t)·(na+nb). A sound upper
    // bound, so pruning below it never drops a qualifying pair — it
    // just keeps tail-token coincidences out of the verify join.
    //
    // Pair dedup stays PER-ROW (each pair survives exactly once, on its
    // order-minimal common prefix token) via the native early-exit
    // first_common_equals kernel — round 16 A/B'd this against a
    // (id_a,id_b) min-pos AGGREGATE variant (shuffle-narrower on paper)
    // and the aggregate lost ~2.5× on the candidate stage: the join
    // emits 8.8M rows at sf0.1 whose per-pair multiplicity is only
    // ~2.7, so hash-aggregating 3.3M groups cost far more than a
    // handful of long compares per row, while the interpreted
    // array_intersect the kernel replaces paid a hash-set + result
    // allocation per row.
    val cands = a.join(b, Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        greatest(col("na"), col("nb")) * t)
      .filter((lit(1) + least(col("na") - col("posa"), col("nb") - col("posb")) - 1)
        .cast("double") >= (col("na") + col("nb")) * (t / (1 + t)))
      .filter(graft.functions.ArrayHashes.first_common_equals(
        col("pa"), col("pb"), col("tok")))
      .select(col("id_a"), col("id_b"))
    val wa = sets.select(col("id").as("id_a"), col("wh").as("wa"))
    val wb = sets.select(col("id").as("id_b"), col("wh").as("wb"))
    cands.join(wa, Seq("id_a")).join(wb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("wa"), col("wb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected-component canonicalization: given near-dup pairs, assign
    * every id the MINIMUM id of its connected component — the "which
    * copy do we keep" rule after pair detection. Iterative min-label
    * propagation (each step fully distributed: one join + one groupBy);
    * the driver only orchestrates until fixpoint. Near-dup components
    * are clique-like, so convergence takes O(diameter) ≈ 2-3 rounds —
    * at 100 TB this is the standard label-propagation pattern, not a
    * driver-side graph walk.
    *
    * Contract: `pairs` holds each undirected pair once (id_a < id_b),
    * which every pair operator in this package guarantees — so the
    * directed edge expansion below is distinct by construction and
    * skips a whole dedup shuffle. Duplicate pairs would not change the
    * RESULT (min is idempotent), only waste join work.
    */
  def minLabelComponents(pairs: DataFrame, ids: DataFrame, idCol: String,
      maxIters: Int = 50): DataFrame = {
    // localCheckpoint per iteration: truncates lineage so Catalyst
    // doesn't re-optimize an ever-growing plan tree (the classic
    // iterative-DataFrame blowup — measured ~10× here)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    // iterate ONLY over edge-incident nodes: untouched ids can never
    // change label, and near-dup components are a tiny fraction of the
    // corpus — so every per-iteration join works on |touched| rows, not
    // |corpus|. Untouched ids get identity labels back in one outer
    // join at the end. (edges holds both directions, so the src column
    // alone covers every endpoint.)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // iteration 0: labels are the identity, so min-label-of-neighbors
      // is just min(src) per dst — one aggregation, no join
      val neighborMin =
        if (iter == 0) edges.groupBy(col("dst")).agg(min(col("src")).as("nmin"))
        else edges.join(labels, edges("src") === labels("id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nmin"))
      // the changed flag is computed inside the same join that produces
      // the next labels (no second self-join per iteration)
      val propagated = labels.join(neighborMin, labels("id") === neighborMin("dst"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("changed"))
      // pointer jumping (path halving): label ← label(label) — sound
      // because label(v) always names a node in v's component, so ITS
      // label is too, and least() keeps labels monotone. Convergence
      // needs ⌈log d⌉-ish rounds instead of d, and the jump join runs
      // on the LABELS table (|touched| rows), not the edge set — at
      // sf0.1 this cut 8 edge-join iterations to 4 (each edge join
      // being ~650× the label table here). The eager localCheckpoint
      // materializes propagate+jump in one job; the convergence probe
      // below is a narrow scan of the cached blocks.
      val jump = propagated.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = propagated.join(jump, propagated("label") === jump("jid"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"),
          (col("changed") ||
            coalesce(col("jlabel"), col("label")) < col("label")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.drop("changed")
      iter += 1
    }
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("label"), col("id")).as("canonical_id"))
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14) — the general-graph alternative to [[minLabelComponents]].
    *
    * INPUT CONTRACT: `pairs` must be CANONICAL — id_a < id_b, no
    * self-loops (what every pair producer in this package emits). The
    * star steps rely on it; a flipped edge silently under-merges
    * (least/greatest-normalize first if edges come from a mapping
    * that can reverse order — ComponentMonitor's lesson).
    *
    * Min-label propagation converges in O(diameter) edge-join rounds
    * (path-halving makes that ~O(log diameter)), which is ideal for the
    * clique-like near-dup graphs this package produces. Alternating
    * star contraction instead converges in O(log n) rounds on ANY
    * graph — long chains, expander-ish link graphs — and its working
    * state is the shrinking EDGE set itself, never a per-node label
    * table, so each round's shuffles get cheaper as components
    * contract. Both produce the identical contract: every node labeled
    * with its component minimum (the same DuckDB recursive-CTE oracle
    * certifies either).
    *
    * Round shape (all distributed, driver only orchestrates):
    *  - large-star: per node u over its full neighborhood,
    *    m = min(Γ(u) ∪ {u}); every neighbor v > u re-attaches to m.
    *    One symmetric groupBy-min + one join; output edges are
    *    canonical (m < v) by construction.
    *  - small-star: per node u over its SMALLER neighbors,
    *    m = min of those; they and u itself attach to m. On canonical
    *    edges that's one groupBy-min on the high endpoint + one join.
    *  - per-round distinct() bounds the edge set (star contraction
    *    re-derives the same edge from many witnesses — dropping the
    *    duplicates is what makes the edge set SHRINK round over round,
    *    the algorithm's whole termination argument).
    * Convergence = edge set fixed, detected by a (count, hash-sum)
    * checksum over the checkpointed round output — two narrow scans of
    * cached blocks, no extra join.
    */
  def alternatingStarComponents(pairs: DataFrame, ids: DataFrame, idCol: String,
      maxIters: Int = 30): DataFrame = {
    var edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .localCheckpoint(true)
    // (count, xor-of-hashes) set checksum: order-insensitive, no
    // overflow (ANSI-safe), equal sets always agree, unequal sets
    // collide with p ≈ 2⁻⁶⁴ (and maxIters still bounds the loop)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.select(xxhash64(col("u"), col("v")).as("h"))
        .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = checksum(edges)
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: m(u) = min over the full neighborhood (symmetric
      // view) and u itself; each canonical edge (u,v) re-emits as
      // (m(u), v) — m(u) ≤ u < v keeps edges canonical, no self-loops
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = edges.join(mins, Seq("u"))
        .select(col("m").as("u"), col("v")).distinct()
      // small-star: per high endpoint v, m = min of its smaller
      // neighbors; those neighbors re-attach to m and v itself joins m
      val smins = ls.groupBy(col("v")).agg(min(col("u")).as("m"))
      val joined = ls.join(smins, Seq("v"))
      val ss = joined.select(col("m").as("u"), col("u").as("v"))
        .filter(col("u") =!= col("v"))
        .unionByName(joined.select(col("m").as("u"), col("v")))
        .distinct()
        .localCheckpoint(true)
      val nextSig = checksum(ss)
      converged = nextSig == sig
      sig = nextSig
      edges = ss
      iter += 1
    }
    // at fixpoint the edge set is a star per component: (min, member)
    val labels = edges.groupBy(col("v").as("id")).agg(min(col("u")).as("label"))
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("label"), col("id")).as("canonical_id"))
  }

  // ---- blocked edit distance ---------------------------------------------

  /** Blocked fuzzy-match pairs by bounded Levenshtein — the general
    * entity-resolution operator: the caller supplies a blocking key
    * (cluster label, LSH bucket, sorted-neighborhood key, …) and the
    * pair space is O(Σ per-block²), never O(corpus²).
    *
    * Cost controls, in evaluation order:
    *  1. block-keyed equi-join (one shuffle on the block key);
    *  2. `|len_a − len_b| ≤ maxDist` prefilter — a free Levenshtein
    *     lower bound that discards most survivors before any DP;
    *  3. `levenshtein(…, maxDist)`: Spark's threshold variant runs the
    *     banded O(len·maxDist) DP and returns −1 early when the bound
    *     is exceeded — never the full O(len²) table.
    * Texts clamp to `maxLen`-char prefixes so the DP cost per pair is
    * bounded no matter what a pathological doc contains.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: Column, maxLen: Int = 32, maxDist: Int = 10): DataFrame = {
    val d = df.select(blockCol.as("blk"), col(idCol).as("id"),
      substring(col(textCol), 1, maxLen).as("prefix"))
      .withColumn("plen", length(col("prefix")))
    val a = d.select(col("blk"), col("id").as("id_a"),
      col("prefix").as("pa"), col("plen").as("la"))
    val b = d.select(col("blk"), col("id").as("id_b"),
      col("prefix").as("pb"), col("plen").as("lb"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("la") - col("lb")) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // threshold variant yields -1 above maxDist
  }

  /** Sorted-neighborhood candidate pairs — the blocking scheme for
    * fuzzy matching when no equality block key exists: order the corpus
    * by a sort key (normalized title, address, …) and pair each record
    * with its `window` following neighbors. Candidates then feed a
    * verifier such as [[editDistancePairs]]' bounded DP.
    *
    * Shape: one global rank ([[Ranking.withGlobalRank]] — range
    * partition + local rank, no single-partition window), then a BAND
    * self-join: neighbors within `window` ranks live in the same or the
    * next rank bucket, so the probe side explodes to exactly 2 bucket
    * keys and the join is equi on bucket — never an inequality
    * nested-loop, never O(n²). Output: (id_a, id_b, gap) with id_a the
    * earlier record in sort order, each pair exactly once.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, sortKey: Column,
      window: Int): DataFrame = {
    val ranked = Ranking.withGlobalRank(
      df.select(col(idCol).as("id"), sortKey.as("snk")), "rk",
      Seq(col("snk").asc, col("id").asc))
    val bucketed = ranked
      .withColumn("bucket", floor((col("rk") - 1) / window).cast("long"))
    val a = bucketed.select(col("id").as("id_a"), col("rk").as("rk_a"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("rk").as("rk_b"))
    a.join(b, Seq("bucket"))
      .filter((col("rk_b") - col("rk_a")).between(1, window))
      .select(col("id_a"), col("id_b"), (col("rk_b") - col("rk_a")).as("gap"))
  }

  // ---- train/eval decontamination ----------------------------------------

  /** Train/eval contamination pairs by n-gram CONTAINMENT — the
    * asymmetric cousin of Jaccard a decontamination pass needs:
    * |shingles(eval) ∩ shingles(train)| / |shingles(eval)|, i.e. "how
    * much of this eval doc already sits inside that training doc".
    *
    * Plan shape: an inverted-index join, not an all-pairs compare —
    * both sides explode to (doc, shingle-hash) rows and meet in ONE
    * shuffle keyed by the 60-bit shingle hash; counts aggregate per
    * (eval, train) pair. `maxDf` drops shingles appearing in more than
    * that many training docs BEFORE the join — the standard guard that
    * keeps boilerplate n-grams (hot keys) from exploding the join at
    * corpus scale; the denominator stays the full eval shingle count,
    * so dropping common shingles only ever lowers containment.
    */
  def ngramContainmentPairs(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.5, maxDf: Long = 1000): DataFrame = {
    def shingles(df: DataFrame, name: String) = spreadForCompute(
        df.select(col(idCol).as(name), col(textCol).as("__t")), col(name))
      .select(col(name),
        explode(graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col("__t")), n)).as("h"))
    val trainSh = shingles(train, "train_id")
    val keep = trainSh.groupBy(col("h"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf).select("h")
    val evalSizes = spreadForCompute(
        eval.select(col(idCol).as("eval_id"), col(textCol).as("__t")),
        col("eval_id"))
      .select(col("eval_id"),
        size(graft.functions.ArrayHashes.shingle_hash_set(
          TextAnalysis.tokens(col("__t")), n)).as("n_eval"))
    shingles(eval, "eval_id")
      .join(keep, Seq("h"), "left_semi")
      .join(trainSh, Seq("h"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_common"))
      .join(evalSizes, Seq("eval_id"))
      .select(col("eval_id"), col("train_id"),
        TextAnalysis.round6(col("n_common").cast("double") / col("n_eval"))
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash over distinct words — bit j is the sign of the sum of
    * ±1 contributions from each word's hash bit j. Single-pass native
    * expression: narrow, shuffle-free, codegen'd.
    */
  def simHash32(text: Column): Column =
    graft.functions.ArrayHashes.simhash32(
      array_distinct(TextAnalysis.tokens(text)))

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- cross-document duplicated-span coverage ---------------------------

  /** Per-document duplicated-span coverage: the fraction of each
    * document's token positions covered by an `n`-gram that also occurs
    * in at least `minDocs` distinct documents — the shuffle-native
    * approximation of exact substring dedup (Lee et al. 2021's
    * suffix-array pass) at n-gram granularity. A span duplicated across
    * the corpus shows up as a run of duplicated n-grams, and the
    * interval-merged coverage of those n-grams recovers the span length
    * without materializing the span text.
    *
    * Output: (id, n_tokens, n_dup_grams, dup_tokens, dup_frac) — one row
    * per input document, dup_* = 0 where nothing is duplicated.
    *
    * Scale shape (the reason this formulation survives 100 TB where a
    * suffix array does not):
    *  1. gram occurrences are a narrow posexplode — O(tokens) rows of
    *     (doc, pos, 60-bit gram hash), no strings past the projection;
    *  2. ONE groupBy on the gram hash finds cross-doc grams (partial
    *     aggregation collapses per-partition repeats before the
    *     exchange);
    *  3. ONE hash join flags occurrences of duplicated grams — both
    *     sides keyed on the same gram hash;
    *  4. coverage is an interval merge inside a doc-partitioned window
    *     (sorted runs of fixed-width intervals), then a doc-keyed
    *     aggregate. Nothing is quadratic; no per-pair work exists at
    *     all, unlike the pair-emitting dedup ops above.
    */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__t")), col("id"))
      .select(col("id"), TextAnalysis.tokens(col("__t")).as("w"))
    // (doc, 0-based pos, gram hash) — empty for docs shorter than n
    // (sequence() would count DOWNWARD on a negative span, so guard it).
    // Materialized ONCE (round 16): the dup-gram aggregate and the
    // occurrence side below otherwise each recompute the full
    // split+md5-per-gram posexplode — the round-15 plan ran the gram
    // generation twice (plus a third split for n_tokens). The
    // checkpointed frame is slim — three scalars per gram occurrence,
    // never text.
    val occ = toks
      .select(col("id"),
        posexplode(when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => hash60(array_join(slice(col("w"), i + 1, lit(n)), " "))))
          .otherwise(array())))
      .toDF("id", "pos", "g")
      .localCheckpoint(true)
    val dupGrams = occ.groupBy(col("g"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("g"))
    // interval-merge the fixed-width [pos, pos+n) intervals per doc:
    // each gram contributes its width minus the overlap with the
    // furthest-reaching earlier interval
    val prevEnd = max(col("pos") + n).over(
      Window.partitionBy(col("id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val perDoc = occ.join(dupGrams, Seq("g"))
      .withColumn("cov",
        greatest(lit(0), col("pos") + n -
          greatest(col("pos"), coalesce(prevEnd, col("pos")))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_dup_grams"), sum(col("cov")).as("dup_tokens"))
    toks.select(col("id"), size(col("w")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
        TextAnalysis.round6(coalesce(col("dup_tokens"), lit(0L))
          .cast("double") / col("n_tokens")).as("dup_frac"))
  }

  // ---- line-level corpus dedup --------------------------------------------

  /** Line-level corpus dedup — the CCNet / RefinedWeb line-wise pass
    * (Wenzek et al. 2020 §3.1 run it BEFORE document dedup): a line
    * occurring in ≥ `minDocs` DISTINCT documents is boilerplate
    * (headers, cookie banners, navigation chrome) and is removed from
    * every document it appears in; the survivors reassemble in their
    * original order. Complements [[dupSpanCoverage]] (which *measures*
    * duplicated spans) by actually REWRITING the text, and
    * [[exactDedup]] (which drops whole documents, not shared lines).
    *
    * Output: (idCol, n_lines, n_dropped, clean_text) — one row per
    * input document; a document of pure boilerplate keeps an empty
    * clean_text rather than vanishing (dropping it is the quality
    * gate's decision, made on n_dropped/n_lines).
    *
    * Scale shape:
    *  1. lines are a narrow posexplode — O(lines) rows, the only
    *     corpus-sized projection;
    *  2. ONE groupBy(line) with map-side partial aggregation finds the
    *     boilerplate set (word-count shape; a corpus-hot line collapses
    *     per partition before the exchange);
    *  3. ONE hash join flags dup occurrences, then a doc-keyed
    *     aggregate reassembles — collect_list is per-DOCUMENT bounded,
    *     never corpus-sized.
    * The group/join key is the line text itself — exact string equality
    * IS the operator's semantics (and what the oracle restates); keying
    * on a 60-bit hash instead would shave exchange bytes at the cost of
    * a collision silently deleting an innocent line at ~10⁹-line scale.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    val dups = lines.groupBy(col("line"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("line"))
    rewriteDroppingLines(lines, dups).withColumnRenamed("id", idCol)
  }

  /** One row per (document, line): (id, pos, line) — [[lineDedup]]'s
    * explode stage, shared with the streaming gate
    * ([[graft.streaming.LineDedupGate]]) whose boilerplate set comes
    * from cross-trigger state instead of a corpus groupBy.
    */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // coalesce: split(null) is null and posexplode would generate ZERO
    // rows — a null-text doc would then silently vanish from lineDedup's
    // reassembly (and from the streaming gate's inner join back),
    // violating the "a doc never vanishes, rejection is the quality
    // gate's decision" contract; as empty text it flows through as one
    // empty line and gets judged downstream like any other doc
    df.select(col(idCol).as("id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1)))
      .toDF("id", "pos", "line")

  /** [[lineDedup]]'s rewrite stage: drop every occurrence of a line in
    * `dupLines` (a one-column `line` frame) and reassemble the
    * survivors in document order. Output: (id, n_lines, n_dropped,
    * clean_text).
    */
  def rewriteDroppingLines(lines: DataFrame, dupLines: DataFrame): DataFrame =
    lines.join(dupLines.select(col("line"), lit(1).as("__dup")),
        Seq("line"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("__dup")).as("n_dropped"), // count skips the non-dup nulls
        // kept lines back in document order: when() yields null on dup
        // rows and collect_list skips nulls; array_sort on the (pos,
        // line) struct orders by pos (unique within a doc)
        array_join(transform(
          array_sort(collect_list(when(col("__dup").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"))
      .select(col("id"), col("n_lines"), col("n_dropped"), col("clean_text"))

  /** SimHash near-dup pairs, verified by Hamming ≤ maxDist.
    *
    * Blocking (round 16): for maxDist ≤ 2 candidates share one of the
    * C(4,2) = 6 two-chunk (16-bit) keys — EXACT by pigeonhole (≤ 2
    * differing bits touch ≤ 2 of the 4 byte chunks, so ≥ 2 chunks are
    * equal and some chunk PAIR matches), with posting lists ~256×
    * more selective than the single-8-bit-chunk scheme (measured at
    * sf0.1: the single-chunk blocks generated ~40× the candidate
    * pairs). Each surviving pair is emitted exactly once via the
    * first-colliding-pair filter (dd2's first-colliding-band trick:
    * a cheap bitwise when-chain on the two simhashes riding the row),
    * so the old DISTINCT exchange over candidates is gone. maxDist 3
    * keeps the single-chunk scheme (its exactness bound); the verify
    * is exact either way.
    *
    * The (id, simhash) frame is materialized once: the self-join
    * otherwise recomputed the full scan + simhash per side, and the
    * join's inferred isnotnull constraint re-evaluated the simhash a
    * second time inside each side's pushed filter — 4 simhash passes
    * per document where one suffices.
    */
  def simHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 2): DataFrame = {
    // spread BEFORE the simhash projection (see spreadForCompute), so
    // the hashing pass parallelizes even over a one-row-group file
    val withSim = spreadForCompute(
        df.select(col(idCol).as("id"), col(textCol).as("__t")), col("id"))
      .select(col("id"), simHash32(col("__t")).as("simhash"))
      .localCheckpoint(true)
    def chunk(sim: Column, c: Int): Column =
      shiftright(sim, c * 8).bitwiseAND(255)
    if (maxDist <= 2) {
      // chunk pairs in fixed order; key packs (pair index, 16-bit value)
      val combos = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
      def pairKeys(sim: Column): Column =
        array(combos.zipWithIndex.map { case ((c1, c2), p) =>
          lit(p.toLong * (1L << 16)) + chunk(sim, c1) * 256 + chunk(sim, c2)
        }: _*)
      val chunked = withSim.select(col("id"), col("simhash"),
        explode(pairKeys(col("simhash"))).as("pk"))
      val a = chunked.select(col("pk"), col("id").as("id_a"), col("simhash").as("sa"))
      val b = chunked.select(col("pk"), col("id").as("id_b"), col("simhash").as("sb"))
      // first colliding chunk pair, derived from the simhashes in-row
      val firstCollide = combos.zipWithIndex.foldRight(lit(-1L)) {
        case (((c1, c2), p), rest) =>
          when(chunk(col("sa"), c1) === chunk(col("sb"), c1) &&
            chunk(col("sa"), c2) === chunk(col("sb"), c2), lit(p.toLong))
            .otherwise(rest)
      }
      a.join(b, Seq("pk"))
        .filter(col("id_a") < col("id_b"))
        .filter(shiftright(col("pk"), 16) === firstCollide)
        .select(col("id_a"), col("id_b"), hamming(col("sa"), col("sb")).as("hamming"))
        .filter(col("hamming") <= maxDist)
    } else {
      // the distinct below needs clustering by a subset of its keys;
      // the checkpoint dropped the partitioning info, so re-establish it
      val rep = withSim.repartition(col("id"))
      // candidate ids deduped across chunks BEFORE the Hamming verify;
      // simhashes ride along (one long each) to avoid a re-join
      val chunked = rep.select(col("id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          concat_ws(":", lit(c), chunk(col("simhash"), c))): _*))
          .as("chunk_key"))
      val a = chunked.select(col("chunk_key"), col("id").as("id_a"), col("simhash").as("sa"))
      val b = chunked.select(col("chunk_key"), col("id").as("id_b"), col("simhash").as("sb"))
      a.join(b, Seq("chunk_key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
        .distinct()
        .select(col("id_a"), col("id_b"), hamming(col("sa"), col("sb")).as("hamming"))
        .filter(col("hamming") <= maxDist)
    }
  }
}
