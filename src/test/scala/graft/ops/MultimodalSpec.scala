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

  test("fake embeddings feed the similarity operators") {
    val emb = Multimodal.fakeEmbedding(media, 8)
    assert(emb.head().getAs[scala.collection.Seq[Float]]("embedding").length == 8)
    val top = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 2), 3)
    assert(top.count() == 6)
  }
}
