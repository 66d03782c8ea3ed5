package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaTable(
    graft.Tables.load(spark, sfSmoke, "documents"))

  test("media table has binary payload and cycled mime types") {
    val r = media.limit(10).collect()
    assert(r.forall(_.getAs[Array[Byte]]("payload").nonEmpty))
    assert(media.select("mime").distinct().count() == 3)
  }

  test("frame sampling cuts payload into ≤4 frames of 64 bytes") {
    val frames = Multimodal.frameSample(media, 64, 4)
    val counts = frames.groupBy("doc_id").count()
    assert(counts.agg(max("count")).head().getLong(0) <= 4)
    // all non-terminal frames are exactly 64 bytes
    val f = frames.filter($"frame_idx" === 0).head()
    assert(f.getAs[Array[Byte]]("frame_bytes").length == 64)
  }

  test("byte histogram runs per partition and conserves byte counts") {
    val hist = Multimodal.byteHistogram(media.repartition(4), 16)
    val r = hist.filter($"doc_id" === 0).head()
    val total = r.getAs[Seq[Long]]("histogram").sum
    assert(total == r.getAs[Int]("n_bytes"))
    assert(hist.count() == media.count())
  }

  test("decode stub is deterministic") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeImageStub(b) == Multimodal.decodeImageStub(b))
  }

  test("real PNG round trip: payloads are genuine PNGs, JDK decode recovers w/h/color") {
    val pngs = Multimodal.pngTable(
      graft.Tables.load(spark, sfSmoke, "documents").limit(20))
    val raw = pngs.collect()
    // PNG magic bytes prove a real encoder ran
    assert(raw.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
    })
    val meta = Multimodal.imageMeta(pngs).collect()
    assert(meta.length == raw.length)
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1 + (id % 16).toInt, "width")
      assert(r.getInt(2) == 1 + ((id * 7) % 16).toInt, "height")
      assert(r.getInt(3) == ((id * 2654435761L) & 0xffffffL).toInt, "rgb0")
    }
    // undecodable payloads are dropped, not task-fatal (ST8 isolation)
    val junk = Seq((99L, "not a png".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.imageMeta(junk).count() == 0)
  }

  test("real WAV round trip: payloads are genuine RIFF/WAVE, decoded " +
      "features match the synthesis arithmetic") {
    val docs = graft.Tables.load(spark, sfSmoke, "documents").limit(20)
    val wavs = Multimodal.wavTable(docs)
    val raw = wavs.collect()
    // RIFF....WAVE magic proves a real encoder ran
    assert(raw.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'
    })
    val feats = Multimodal.wavFrameFeatures(wavs).collect()
    assert(feats.length == raw.length * 4, "640 samples / 160 per frame = 4 frames")
    feats.foreach { r =>
      val (id, frame) = (r.getLong(0), r.getLong(1))
      val samples = (frame * 160 until (frame + 1) * 160)
        .map(i => Multimodal.wavSample(id, i.toInt))
      assert(r.getLong(2) == 160L, "n_samples")
      assert(r.getLong(3) == samples.map(v => math.abs(v.toLong)).max, "peak")
      assert(r.getLong(4) == samples.map(v => v.toLong * v).sum, "energy")
    }
    // undecodable payloads are dropped, not task-fatal (ST8 isolation)
    val junk = Seq((99L, "not a wav".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.wavFrameFeatures(junk).count() == 0)
  }

  test("fake embeddings feed the similarity operators") {
    val emb = Multimodal.fakeEmbedding(media, 8)
    assert(emb.head().getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    val top = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 2), 3)
    assert(top.count() == 6)
  }

  test("Hamming-band near-dup pairs == brute force, including the distance boundary") {
    // synthetic hashes with known pairwise distances: the band join's
    // pigeonhole guarantee (zero false negatives at ≤ maxDist) and the
    // verification filter (maxDist+1 excluded) both pinned, plus the
    // sign bit (63) and a distance-0 pair that matches in EVERY band
    // yet must emit once
    val base = 0x0123456789ABCDEFL
    val corpus = Seq(
      (1L, base),
      (2L, base ^ (1L << 63)), // d=1 via the sign bit
      (3L, base ^ 0x7L), // d=3: exactly maxDist
      (4L, base ^ 0xFL), // d=4: just over
      (5L, 0L)).toDF("doc_id", "phash")
    val probes = Seq((10L, base)).toDF("doc_id", "phash")
    val got = Multimodal.dHashNearDupPairs(corpus, probes, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 0), (10L, 2L, 1), (10L, 3L, 3)))
  }

  test("retouched gradient PNGs are within one dHash bit of their class, and only their class") {
    val reps = graft.Tables.load(spark, sfSmoke, "documents")
      .filter($"doc_id" < 50)
    val corpus = Multimodal.dHash64(Multimodal.gradientPngTable(reps))
    val probes = Multimodal.dHash64(Multimodal.gradientPngTableRetouched(reps))
    val pairs = Multimodal.dHashNearDupPairs(corpus, probes, maxDist = 3)
      .as[(Long, Long, Int)].collect()
    // every probe matches exactly its own representative (cross-class
    // gradient distances are ≥ 12), at distance 0 or 1 (the single
    // retouched pixel feeds exactly one dHash comparison)
    assert(pairs.length == 50)
    assert(pairs.forall { case (p, m, d) => p == m && d <= 1 })
  }

  test("segmentCanonical elects one survivor and fails loudly on seg_idx outside the packing bound") {
    val segs = Seq(
      (1L, 1L, 100L), (2L, 1L, 300L), (3L, 1L, 200L), // one component via pairs
      (9L, 1L, 50L) // singleton
    ).toDF("doc_id", "seg_idx", "energy")
    val pairs = Seq((1L, 1L, 2L, 1L), (2L, 1L, 3L, 1L))
      .toDF("doc_id1", "seg_idx1", "doc_id2", "seg_idx2")
    val got = Multimodal.segmentCanonical(segs, pairs)
      .as[(Long, Long, Long, Long)].collect().toSet
    // highest energy wins the component; the singleton keeps itself
    assert(got == Set((1L, 1L, 2L, 1L), (2L, 1L, 2L, 1L), (3L, 1L, 2L, 1L),
      (9L, 1L, 9L, 1L)))
    // a seg_idx ≥ 100 would silently collide packed node ids — the
    // guard must turn the violated invariant into an explicit error
    val badSegs = Seq((1L, 150L, 10L)).toDF("doc_id", "seg_idx", "energy")
    val e = intercept[Exception] {
      Multimodal.segmentCanonical(badSegs, pairs.limit(0)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("node packing")))
  }

  test("dHash survives a full transcode (decode → resample → re-encode)") {
    // the perceptual-dedup claim: the hash is a function of the image,
    // not its encoding — a second trip through the codec (same-size
    // nearest-neighbor resample = identity mapping) must not flip a bit
    val docs = graft.Tables.load(spark, sfSmoke, "documents").limit(50)
    val pngs = Multimodal.gradientPngTable(docs)
    val direct = Multimodal.dHash64(pngs)
      .as[(Long, Long)].collect().toMap
    val transcoded = Multimodal.dHash64(Multimodal.resizeImages(pngs, 16, 16))
      .as[(Long, Long)].collect().toMap
    assert(direct.nonEmpty && direct == transcoded)
  }
}
