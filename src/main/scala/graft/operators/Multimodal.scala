package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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

  /** m1: binary-column pipeline. Documents' text stands in for a media
    * payload: encode → (payload binary, metadata struct) → repartition by
    * source (locality for the decode pass) → batched decode →
    * per-source feature aggregation.
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
    val features: Dataset[MediaFeature] = media
      .repartition(col("meta.source"))
      .select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, mime, payload) => FakeDecoder.decode(id, mime, payload) }
      }

    features.toDF()
      .join(t.documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("checksum64")).as("min_checksum"),
        avg(col("width")).cast("double").as("avg_width"))
      .orderBy(col("source"))
  }
}
