package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/featurized per partition.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`decodeImageStub`) — everything
  * around it (schema, binary payloads, partition-batch processing,
  * frame sampling, feature shape) is real Spark plumbing and tested.
  * Swapping the stub for javax.imageio / ffmpeg bindings changes no
  * plan shape: the mapPartitions batch iterator is exactly where a real
  * codec would run, one partition per task, no driver involvement.
  */
object Multimodal {

  /** Synthesize a deterministic media table from `documents`: payload =
    * utf-8 bytes of the text, mime cycled by doc_id. Stands in for a
    * parquet table with real binary media columns.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** Typed metadata from the payload — pure Column DSL, pushdown-safe.
    * Width/height/duration derive deterministically from the byte length
    * (the STUB for header parsing).
    */
  def mediaMeta(media: DataFrame): DataFrame = {
    val size = length(col("payload"))
    media.select(
      col("doc_id"), col("mime"),
      size.as("size_bytes"),
      when(col("mime").startsWith("image"), lit(64) + size % 512)
        .otherwise(lit(null).cast("integer")).as("width"),
      when(col("mime").startsWith("image"), lit(64) + (size * 7) % 512)
        .otherwise(lit(null).cast("integer")).as("height"),
      when(!col("mime").startsWith("image"), size * 10)
        .otherwise(lit(null).cast("long")).as("duration_ms"))
  }

  /** Frame sampling: cut the payload into fixed-size frames (first
    * `maxFrames`), one row per frame — binary-native substring, the
    * shape a video pipeline uses for keyframe extraction.
    */
  def frameSample(media: DataFrame, frameSize: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(ceil(length(col("payload")).cast("double") / frameSize).cast("int"),
      lit(maxFrames))
    media
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .select(
        col("doc_id"), col("frame_idx"),
        substring(col("payload"), col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame_bytes"))
      .withColumn("frame_md5", md5(col("frame_bytes")))
  }

  /** STUB image decode — deterministic fake standing in for a codec.
    * Real implementation would be e.g. ImageIO.read over the bytes; the
    * container ships no codecs, so this derives a fake pixel summary
    * from the payload deterministically.
    */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Long) = {
    val size = payload.length
    val checksum = payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
    (64 + size % 512, 64 + (size * 7) % 512, checksum)
  }

  /** Per-partition featurization: byte histogram (2^4 buckets) — the
    * imperative batch path where a real model/codec would run. One task
    * per partition; no data moves to the driver.
    */
  def byteHistogram(media: DataFrame, buckets: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("histogram", ArrayType(LongType))))
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("doc_id")
    val width = 256 / buckets
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val hist = new Array[Long](buckets)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) / width) += 1
          i += 1
        }
        Row(r.getLong(idIdx), bytes.length, hist.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic fake embedding from payload md5 — plumbs media rows
    * into the Similarity operators (shape/partitioning real, values
    * stubbed).
    */
  def fakeEmbedding(media: DataFrame, dims: Int = 8): DataFrame = {
    val h = md5(col("payload"))
    val vec = array((0 until dims).map { i =>
      ((conv(substring(h, i * 2 + 1, 2), 16, 10).cast("double") - 127.5) / 127.5).cast("float")
    }: _*)
    media.select(col("doc_id").as("vec_id"), vec.as("embedding"))
  }
}
