package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: treat media as opaque `binary` payloads
  * with a typed metadata struct, and run decode / feature-extraction as
  * a batched per-partition pass (the Scala analog of `mapInPandas` —
  * one batch per partition, vectorizable library call inside).
  *
  * The real decoder is STUBBED (no image/audio libraries in this
  * container): `FakeDecoder.decode` is a deterministic stand-in keeping
  * the Spark-side contract — schema, batch iteration, partitioning —
  * fully real and tested. Swapping in a JNI/FFI decoder changes only the
  * function body.
  */
object Multimodal {

  /** Typed row after media "decode". */
  case class MediaFeature(doc_id: Long, mime: String, byte_len: Long, checksum64: Long, width: Int, height: Int)

  /** The stub decoder: byte length, FNV-64 checksum, fake dimensions
    * derived deterministically from the payload. A real implementation
    * would decode pixels/samples here — per BATCH, not per row.
    */
  object FakeDecoder {
    def decode(docId: Long, mime: String, payload: Array[Byte]): MediaFeature = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) { h ^= (payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      val w = 64 + (math.abs(h) % 1024).toInt
      val ht = 64 + (math.abs(h >> 10) % 1024).toInt
      MediaFeature(docId, mime, payload.length.toLong, h, w, ht)
    }
  }

  /** Fixed-size "thumbnail" of a payload: byte-domain nearest-neighbor
    * resample — the shape (and batch contract) of an image resize, with
    * the pixel decode stubbed (no codec libraries in this container).
    */
  def resizeStub(payload: Array[Byte], outLen: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = payload((i.toLong * payload.length / outLen).toInt); i += 1 }
    out
  }

  /** Evenly spaced "frames" of a payload — the video frame-sample batch
    * shape: one row in, `n` (frame_idx, frame_payload) rows out.
    */
  def frameSampleStub(payload: Array[Byte], n: Int, frameLen: Int): Seq[(Int, Array[Byte])] =
    (0 until n).map { i =>
      val start = if (n == 1) 0 else (i.toLong * math.max(0, payload.length - frameLen) / (n - 1)).toInt
      (i, payload.slice(start, math.min(payload.length, start + frameLen)))
    }

  /** m1b: resize + frame-sample over the binary column, batched per
    * partition (flatMap for the 1→n frame expansion). Deterministic
    * stubs; the Spark-side schema/batch contract is the real thing.
    */
  def frames(t: Tables, nFrames: Int = 3, frameLen: Int = 32): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    t.documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          val thumb = resizeStub(payload, 16)
          frameSampleStub(payload, nFrames, frameLen).map { case (idx, frame) =>
            (id, idx, frame.length, java.util.Arrays.hashCode(frame), java.util.Arrays.hashCode(thumb))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_hash", "thumb_hash")
  }

  /** m1: binary-column pipeline. Documents' text stands in for a media
    * payload: encode → (payload binary, metadata struct) → batched decode
    * per scan partition → per-source feature aggregation.
    *
    * The decode is per-row work needing no co-location, so the payload is
    * NOT repartitioned before it: a keyed exchange here (the former
    * `repartition(meta.source)`, ~20 distinct values) would shuffle the
    * FULL binary corpus into at most #sources tasks — parallelism
    * collapse plus skew at 100 TB, for zero algorithmic benefit.
    * [[spreadIfNarrow]] still fans a degenerate few-split local scan out
    * to all cores (round-robin, and only then); a well-split at-scale
    * scan passes through with no payload exchange at all.
    */
  def pipeline(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._

    val media = t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source"),
        col("n_chars").as("declared_len")).as("meta"))

    // decode runs once per partition over an iterator: the batch shape a
    // native decoder needs (load model/codec once, stream rows through).
    // `source` rides ALONG the decode from the metadata struct — the
    // former re-join against documents to recover it was an n×n-row
    // shuffle at corpus scale for a column the row already carried.
    val features = spreadIfNarrow(media)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.source").as("source"), col("payload"))
      .as[(Long, String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, mime, source, payload) =>
          val f: MediaFeature = FakeDecoder.decode(id, mime, payload)
          (f.doc_id, f.mime, source, f.byte_len, f.checksum64, f.width, f.height)
        }
      }
      .toDF("doc_id", "mime", "source", "byte_len", "checksum64", "width", "height")

    features
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("checksum64")).as("min_checksum"),
        avg(col("width")).cast("double").as("avg_width"))
      .orderBy(col("source"))
  }
}
