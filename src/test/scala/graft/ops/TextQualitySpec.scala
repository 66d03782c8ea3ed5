package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals flag degenerate docs and pass clean ones") {
    val d = Seq(
      (1L, "spam spam spam spam spam"),                 // all one token
      (2L, "one two three four five six seven eight"),  // no repetition
      (3L, "a b c a b c a b c"))                        // repeated trigram
      .toDF("doc_id", "text")
    val out = TextQuality.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 1.0)            // top unigram is 100% of tokens
    assert(out(2L)._1 == 0.125)          // 1/8
    assert(out(2L)._2 == 0.0)            // every trigram unique
    assert(out(3L)._2 > 0.5)             // 'a b c' occurs 3x of 7 trigrams
    assert(out(1L)._2 == 1.0)            // 'spam spam spam' x3
  }

  test("tfIdf keywords rank rare terms above common ones") {
    val d = Seq(
      (1L, "shared shared unique1"),
      (2L, "shared shared unique2"),
      (3L, "shared shared unique3"))
      .toDF("doc_id", "text")
    val out = TextQuality.tfIdfKeywords(d, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'shared' has df=3, the unique terms df=1: tf 1/3 * N/df 3 = 1.0 vs
    // shared's 2/3 * 1 = 0.667 -> unique wins everywhere
    assert(out == Map(1L -> "unique1", 2L -> "unique2", 3L -> "unique3"))
  }

  test("piiRedact masks emails and phones and counts them") {
    val d = Seq((1L, "write bob.smith@corp.io or +1-555-0199 now"),
                (2L, "nothing here")).toDF("doc_id", "text")
    val out = TextQuality.piiRedact(d, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"))).toMap
    assert(out(1L)._1 == "write [EMAIL] or [PHONE] now")
    assert(out(1L)._2 == 1L && out(1L)._3 == 1L)
    assert(out(2L) == (("nothing here", 0L, 0L)))
  }

  test("vocabTopK and adjacentPairCounts order by count then lexicographic") {
    val d = Seq((1L, "b a b c b a")).toDF("doc_id", "text")
    val vocab = TextQuality.vocabTopK(d, "text", 2)
      .select("rank", "token", "n").as[(Long, String, Long)].collect().toSeq
    assert(vocab == Seq((1L, "b", 3L), (2L, "a", 2L)))
    val pairs = TextQuality.adjacentPairCounts(d, "text", 3)
      .select("rank", "pair", "n").as[(Long, String, Long)].collect().toSeq
    // pairs: "b a" x2, "a b", "b c", "c b"
    assert(pairs == Seq((1L, "b a", 2L), (2L, "a b", 1L), (3L, "b c", 1L)))
  }

  test("adjacentPairCounts drops single-token docs") {
    val d = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(TextQuality.adjacentPairCounts(d, "text", 10).count() == 0)
  }

  test("tokenizeIds maps in-vocab tokens to ranks and OOV to zero") {
    val d = Seq((1L, "b b a zz"), (2L, "a b")).toDF("doc_id", "text")
    // vocab top-2: b (rank 1, 3 occurrences), a (rank 2, 2 occurrences)
    val out = TextQuality.tokenizeIds(d, "doc_id", "text", vocabK = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == 1L) // zz is OOV
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5("1,1,2,0"))
    assert(out(2L)._3 == md5("2,1"))
  }

  test("mixtureSample keeps everything at rate 100 and nothing at rate 0") {
    val d = (1 to 200).map(i => (if (i % 2 == 0) "all" else "none", i.toLong))
      .toDF("source", "doc_id")
    val kept = graft.ops.Stats.mixtureSample(d, "source", "doc_id",
      Map("all" -> 100, "none" -> 0), defaultRate = 50)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("all") == 100L)
    assert(!kept.contains("none"))
  }

  test("invertedIndex digests sorted postings and applies minDf") {
    val d = Seq((3L, "x y"), (1L, "x z"), (2L, "x")).toDF("doc_id", "text")
    val out = TextQuality.invertedIndex(d, "doc_id", "text", minDf = 2L)
      .select("term", "df", "postings_md5").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == Set("x")) // y, z have df 1
    assert(out("x")._1 == 3L)
    // postings are sorted by doc id regardless of arrival order
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("1,2,3".getBytes).map("%02x".format(_)).mkString
    assert(out("x")._2 == expected)
  }

  test("invertedIndex maxDf drops a planted stop word before the posting collect") {
    // "the" appears in EVERY doc (df = 60 > maxDf = 10): pre-guard it
    // would collect the whole corpus into one grouped row
    val d = (1 to 60).map(i => (i.toLong, s"the tok${i % 20} word"))
      .toDF("doc_id", "text")
    val out = TextQuality.invertedIndex(d, "doc_id", "text", minDf = 2L, maxDf = 10L)
    val terms = out.select("term").as[String].collect().toSet
    assert(!terms.contains("the"), "stop word survived the maxDf guard")
    assert(!terms.contains("word"), "df=60 term survived the maxDf guard")
    assert(terms == (0 until 20).map(i => s"tok$i").toSet) // df=3 each
    // the guard must prune BEFORE the collect aggregate: a broadcast
    // left-anti join below the final aggregation, so hot-term rows
    // never enter the posting-list shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti-join in plan:\n$plan")
  }

  test("cooccurrenceLift ranks exclusive pairs above promiscuous ones") {
    // "p q" always together (lift high); "x" pairs with many partners
    val d = Seq((1L, "p q"), (2L, "p q"), (3L, "p q"), (4L, "p q"), (5L, "p q"),
                (6L, "x a x b x c x a x b x c x a x b x c x d"))
      .toDF("doc_id", "text")
    val out = TextQuality.cooccurrenceLift(d, "text", minPairCount = 5L, k = 5)
      .select("a", "b").as[(String, String)].collect()
    assert(out.head == (("p", "q")))
  }

  test("chunkTokens overlaps by size-stride and keeps short docs whole") {
    // 10 tokens, size 4, stride 3: nChunks = (10-4)/3 + 1 = 3,
    // starts 1/4/7 -> tokens [1-4], [4-7], [7-10]
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
                (2L, "a b")).toDF("doc_id", "text")
    val out = graft.ops.Packing.chunkTokens(d, "doc_id", "text", size = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_tokens").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(out == Seq((1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L), (2L, 0L, 2L)))
  }

  test("bpeMerges: greedy non-overlapping merges, tie-break, cross-round growth") {
    // "a a a a b": round 1 counts (a,a)=3 but greedy left-to-right can
    // only MERGE two non-overlapping occurrences; round 2 then pairs
    // the merged tokens, with the (n=1) tie broken by pair ordering
    val d = Seq("a a a a b").toDF("text")
    val out = graft.ops.TextQuality.bpeMerges(d, "text", rounds = 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a a", 3L), (2, "a a a a", 1L)))
  }

  test("bpeMerges: single-token and cross-doc pairs count per document") {
    val d = Seq("x", "p q", "p q r").toDF("text") // 1-token doc must not crash
    val out = graft.ops.TextQuality.bpeMerges(d, "text", rounds = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "p q", 2L)))
  }

  test("bpeEncode applies the trained merges in rank order; unseen text encodes too") {
    // corpus: (a,b) is the round-1 merge (3 occurrences), then
    // ("a b", c) wins round 2 (2 occurrences) — hand-derivable
    val corpus = Seq(
      (1L, "a b a b c"),
      (2L, "a b c d")).toDF("doc_id", "text")
    val merges = graft.ops.TextQuality.bpeMergeTable(corpus, "text", rounds = 2)
    assert(merges.orderBy("round").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1, "a", "b", 3L), (2, "a b", "c", 2L)))

    // round-trip: encoding the TRAINING corpus reproduces the trainer's
    // own final rewrite (each rank's single pass is its fixpoint)
    val enc = graft.ops.TextQuality.bpeEncode(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(enc(1L) == List("a b", "a b c"))
    assert(enc(2L) == List("a b c", "d"))

    // a frozen-table encode of UNSEEN text (the production posture):
    // merges apply in rank order, left-to-right, non-overlapping
    val unseen = Seq((9L, "b a b c a"), (10L, "x")).toDF("doc_id", "text")
    val enc2 = graft.ops.TextQuality.bpeEncode(unseen, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(enc2(9L) == List("b", "a b c", "a"))
    assert(enc2(10L) == List("x"))
  }

  test("bpeEncode at production rule counts: 1,200 rules batched across passes") {
    // a CHAIN merge table — rule k merges (the k-token prefix merged so
    // far, t<k>) — is the hardest case for pass batching: every rule
    // depends on the previous rule's output, so correctness REQUIRES
    // rule k+1 (next pass, after the checkpoint) to see rule k's
    // rewrite. 1,200 rules at the default 200/pass = 6 projections +
    // 5 checkpoints.
    val nRules = 1200
    val prefix = new StringBuilder("t0")
    val rules = (1 to nRules).map { k =>
      val a = prefix.toString; prefix.append(s" t$k"); (k, a, s"t$k")
    }
    val merges = rules.toDF("round", "a", "b")
    val chainDoc = (0 to nRules).map(i => s"t$i").mkString(" ")
    val suffixDoc = (600 to 700).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, chainDoc), (2L, suffixDoc)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val enc = graft.ops.TextQuality.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    info(f"1,200-rule encode (6 passes, 5 checkpoints): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // the chain doc collapses to ONE token spelling the whole prefix
    assert(enc(1L) == List(chainDoc))
    // rule k's left side carries the t0-prefix, so no rule matches a
    // mid-corpus suffix — it must pass through all 6 passes unchanged
    assert(enc(2L) == (600 to 700).map(i => s"t$i").toList)

    // cross-check the batched path against a driver-side reference
    // encoder on docs where only SOME rules fire, at a pass size that
    // puts a boundary mid-chain (7/3 ⇒ boundaries after rules 3 and 6)
    def refMerge(w: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
          out += s"$a $b"; i += 2
        } else { out += w(i); i += 1 }
      }
      out.toList
    }
    val few = rules.take(7)
    val fewDf = few.toDF("round", "a", "b")
    val mixDocs = (0 until 12).map { d =>
      (d.toLong, (0 until 10).map(j => s"t${(d * 7 + j * j) % 9}").mkString(" "))
    }
    val got = graft.ops.TextQuality.bpeEncode(
        mixDocs.toDF("doc_id", "text"), "doc_id", "text", fewDf, rulesPerPass = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    mixDocs.foreach { case (id, text) =>
      val want = few.foldLeft(text.split(" ").toList) {
        case (w, (_, a, b)) => refMerge(w, a, b)
      }
      assert(got(id) == want, s"doc $id diverged from the reference encoder")
    }
  }

  test("dsirScoreAgainst over the training corpus reproduces dsirScores bit-for-bit") {
    // the frozen-artifact split (train dsirRatioTable once, score any
    // batch against it) must compute EXACTLY what the one-shot
    // dsirScores computes when the scored corpus IS the training corpus
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the log"),
      (3L, "de", "der hund sitzt auf dem baum"),
      (4L, "de", "die katze schlaeft auf der matte"),
      (5L, "en", "der cat on mat")).toDF("doc_id", "lang", "text")
    val direct = graft.ops.TextQuality.dsirScores(
      docs, col("lang") === "en", "doc_id", "text", buckets = 64)
    val ratio = graft.ops.TextQuality.dsirRatioTable(
      docs, col("lang") === "en", "doc_id", "text", buckets = 64)
    val frozen = graft.ops.TextQuality.dsirScoreAgainst(
      docs, "doc_id", "text", ratio, buckets = 64)
    assert(direct.orderBy("doc_id").collect().map(_.toString).toSeq ==
      frozen.orderBy("doc_id").collect().map(_.toString).toSeq)
  }

  test("dsirScoreAgainst scores UNSEEN buckets with the table's own smoothing") {
    // an untrained bucket's add-1 ratio is (tq+B)/(tt+B), not 1 — the
    // ratio table freezes it as sentinel bkt = -1 so a novel-feature
    // doc scores consistently with the table's arithmetic
    val B = 64
    val train = Seq(
      (1L, true, "aa bb cc"), (2L, false, "dd ee ff gg hh ii jj kk"))
      .toDF("doc_id", "is_tgt", "text")
    val ratio = graft.ops.TextQuality.dsirRatioTable(
      train, col("is_tgt"), "doc_id", "text", buckets = B)
    val trained = ratio.filter(col("bkt") >= 0L)
      .select("bkt").as[Long].collect().toSet
    // tq = all feature instances, tt = target instances:
    // 3+8 unigrams + 2+7 bigrams = 20; target 3+2 = 5
    val (tq, tt) = (20L, 5L)
    val expect6 = math.floor((tq + B).toDouble / (tt + B) * 1e6 + 0.5).toLong
    assert(ratio.filter(col("bkt") === -1L).select("r6").as[Long]
      .collect().toSeq == Seq(expect6))
    // a single-token doc whose bucket is untrained scores EXACTLY the
    // sentinel ratio (one feature, no bigram) — pick the token by probe
    def bkt(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir|$tok".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % B
    }
    val novel = (0 until 1000).map(i => s"zq$i")
      .find(t => !trained.contains(bkt(t))).get
    val scored = graft.ops.TextQuality.dsirScoreAgainst(
        Seq((7L, novel)).toDF("doc_id", "text"), "doc_id", "text", ratio, B)
      .select("n_features", "dsir_score").as[(Long, Double)].collect()
    assert(scored.toSeq == Seq((1L, expect6.toDouble / 1e6)))
    // a pre-sentinel table (no bkt = -1 row) keeps the old neutral 1.0
    val legacy = graft.ops.TextQuality.dsirScoreAgainst(
        Seq((8L, novel)).toDF("doc_id", "text"), "doc_id", "text",
        ratio.filter(col("bkt") >= 0L), B)
      .select("dsir_score").as[Double].collect()
    assert(legacy.toSeq == Seq(1.0))
  }

  test("dsirScores separates target-distribution docs from off-distribution ones") {
    // disjoint vocabularies: every target feature lands in buckets where
    // p̂/q̂ > 1 and every off-target feature where p̂/q̂ < 1, so the two
    // score populations must separate COMPLETELY
    val docs = (
      (1 to 20).map(i => (i.toLong, "alpha beta gamma delta epsilon", true)) ++
      (21 to 40).map(i => (i.toLong, "zeta eta theta iota kappa", false)))
      .toDF("doc_id", "text", "is_tgt")
    val scored = graft.ops.TextQuality
      .dsirScores(docs, col("is_tgt"), "doc_id", "text", buckets = 64)
      .select("doc_id", "dsir_score").as[(Long, Double)].collect().toMap
    assert(scored.size == 40)
    val (tgt, off) = scored.partition(_._1 <= 20)
    assert(tgt.values.min > off.values.max,
      s"target docs must outscore off-target: ${tgt.values.min} vs ${off.values.max}")
    // identical docs score identically (hash + arithmetic deterministic)
    assert(tgt.values.toSet.size == 1 && off.values.toSet.size == 1)
  }

  test("classifyByLift recovers class-typical vocabulary; unseen ties break to first class") {
    val train = Seq(
      ("en", "the cat sat on the mat"),
      ("en", "the dog ate the food"),
      ("fr", "le chat est sur le tapis"),
      ("fr", "le chien mange le pain"))
      .toDF("lang", "text")
    val model = TextQuality.trainClassLift(train, "lang", "text")
    val test0 = Seq(
      (1L, "the cat ate"),        // en vocabulary
      (2L, "le chat mange"),      // fr vocabulary
      (3L, "zz1 zz2 zz3"))        // never-seen tokens, balanced classes
      .toDF("doc_id", "text")
    val out = TextQuality.classifyByLift(model, test0, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "en")
    assert(out(2L)._1 == "fr")
    // both classes have 11 training tokens (cc equal), so an all-unseen
    // doc scores identically against each -> lexicographic tie-break
    assert(out(3L)._1 == "en")
    // the all-unseen score is exactly the smoothed floor (tot+V)/(cc+V):
    // tot=22, V=16, cc=11 -> floor(38/27 * 1e6 + 0.5) = 1407407. (A
    // class-EXCLUSIVE token hits the same value — (cwc+1) = (cw+1)
    // cancels — so exclusive-vocab docs tie it; separation comes from
    // the OTHER class's cwc=0-but-cw>0 lift being strictly smaller.)
    assert(out(3L)._2 == 1407407L)
    assert(out(1L)._2 == out(3L)._2)
  }

  test("classifyByLift scores off a persisted model identically (frozen-artifact path)") {
    val train = Seq(("a", "alpha beta beta"), ("b", "gamma delta")).toDF("lang", "text")
    val docs = Seq((1L, "beta beta gamma"), (2L, "delta delta")).toDF("doc_id", "text")
    val model = TextQuality.trainClassLift(train, "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("cl_model").toString
    model.write.mode("overwrite").parquet(dir)
    val live = TextQuality.classifyByLift(model, docs, "doc_id", "text").collect().toSeq
    val frozen = TextQuality.classifyByLift(spark.read.parquet(dir), docs, "doc_id", "text")
      .collect().toSeq
    assert(live.sortBy(_.getLong(0)).map(_.toString) ==
      frozen.sortBy(_.getLong(0)).map(_.toString))
  }
}
