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

  /** Codegen twin of [[resizeStub]]: the fixed-size byte-domain
    * thumbnail as PURE column arithmetic (transform over a sequence —
    * no UDF, no mapPartitions), byte i = payload[(i·len) div outLen].
    * Returns (doc_id, thumb: array<int>). MultimodalSpec proves it
    * byte-equal to [[resizeStub]] on ASCII payloads (the char-domain
    * `ascii(substr)` equals the byte domain exactly there; the oracle
    * replays the char domain on both engines, so cross-engine parity
    * holds for ANY text). Staying in Catalyst keeps the signature pass
    * inside whole-stage codegen AND makes it exactly replayable.
    */
  def thumbSignatures(t: Tables, outLen: Int = 32): DataFrame =
    t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, ${outLen - 1}),
           |  i -> ascii(substr(text, CAST((CAST(i AS BIGINT) * length(text)) DIV $outLen AS INT) + 1, 1)))"""
          .stripMargin).as("thumb"))

  /** m5: REPRESENTATION-level exact media dedup — group documents by
    * their full decoded-thumbnail signature and keep the minimum id per
    * group: the media analog of canonical-form dedup (byte-hash dedup
    * misses a re-encoded or resized identical image; the normalized
    * decoded representation is what recurs). Complements m3: m3 finds
    * NEAR-dups via banded Hamming pairs, m5 collapses EXACT
    * representation duplicates with no pair term at all — one
    * signature-keyed aggregation, d1's shape in the decoded domain.
    * Decode is the stubbed byte-domain thumbnail ([[thumbSignatures]] —
    * pure codegen, exactly replayable).
    */
  def thumbDedup(t: Tables, outLen: Int = 32): DataFrame =
    thumbDedupOf(t.documents.select(col("doc_id"), col("text")), outLen)

  /** m5 over any (doc_id, text-as-payload) frame — the `queries()` row
    * feeds it the corpus plus PLANTED re-encodes (bytes differ, decoded
    * representation identical), since the synthetic corpus carries no
    * natural representation duplicates (the t9/d11 synthesis pattern).
    */
  def thumbDedupOf(docs: DataFrame, outLen: Int = 32): DataFrame = {
    val sigs = docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, ${outLen - 1}),
           |  i -> ascii(substr(text, CAST((CAST(i AS BIGINT) * length(text)) DIV $outLen AS INT) + 1, 1)))"""
          .stripMargin).as("thumb"))
      .withColumn("tk", concat_ws(",", transform(col("thumb"), _.cast("string"))))
      .select(col("doc_id"), col("tk"))
      .localCheckpoint(true) // feeds the keeper aggregation AND the join back
    val keep = sigs.groupBy(col("tk"))
      .agg(min(col("doc_id")).as("dup_of"), count(lit(1)).as("n_copies"))
    sigs.join(keep, Seq("tk"))
      .filter(col("doc_id") =!= col("dup_of"))
      .select(col("doc_id"), col("dup_of"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** m3: binary near-dup — the perceptual-hash dedup pipeline an image
    * corpus runs (pHash → band buckets → verify), with the pixel decode
    * stubbed as the byte-domain thumbnail ([[thumbSignatures]]) and
    * everything else real: signatures band into `bands` sub-arrays,
    * candidate pairs form ONLY on band equality (the d3 shape — never
    * all-pairs), and survivors verify by exact Hamming distance over the
    * full signature. A band-bucket size guard fails loudly before a
    * degenerate bucket (e.g. a constant boilerplate payload) can go
    * quadratic — the d8 `maxClusterSize` convention.
    */
  def binaryNearDup(t: Tables, outLen: Int = 32, bands: Int = 4,
      maxHamming: Int = 4, maxBucket: Long = 500): DataFrame = {
    val bandLen = outLen / bands
    require(bands * bandLen == outLen, s"bands=$bands must divide outLen=$outLen")
    val sig = thumbSignatures(t, outLen).localCheckpoint(true)
    val banded = sig.select(col("doc_id"), col("thumb"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), b -> struct(b AS band, slice(thumb, b * $bandLen + 1, $bandLen) AS key))")).as("bk"))
      .select(col("doc_id"), col("thumb"), col("bk.band").as("band"), col("bk.key").as("key"))
    val hot = banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket).limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"band bucket (band=${r.get(0)}, n=${r.getLong(2)}) exceeds maxBucket=$maxBucket — " +
        "a degenerate constant payload would make the candidate join quadratic; raise " +
        "maxBucket deliberately or pre-filter the payload class"
    })
    // output is the VERIFY AUDIT, not just survivors: every band-collision
    // candidate with its exact hamming and the near verdict — the report a
    // dedup run reviews to tune its threshold (false-positive collisions
    // are visible instead of silently vanishing)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.thumb").as("ta"), col("b.thumb").as("tb"))
      .distinct()
      .withColumn("hamming",
        expr("aggregate(zip_with(ta, tb, (x, y) -> CAST(IF(x = y, 0, 1) AS INT)), 0, (acc, v) -> acc + v)"))
      .select(col("id_a"), col("id_b"), col("hamming"),
        (col("hamming") <= maxHamming).as("is_near"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** m4: payload byte-distribution stats — the pre-decode health screen
    * a media pipeline runs before spending decoder cycles: per payload
    * its byte length, distinct byte count, byte-collision probability
    * (Σ(c/n)² — the Simpson index, the exact-arithmetic stand-in for
    * entropy: healthy compressed media ≈ 1/256, truncated/zero-padded
    * payloads spike toward 1), and the modal byte with its share
    * (padding and corruption show up as one byte dominating).
    *
    * All metrics are integer counts plus ONE exact division each, so
    * the result is bit-identical cross-engine (no logarithms — log2
    * entropy would differ in ulps between libm implementations and make
    * the oracle flaky). Per-row work in the m-family's batched
    * mapPartitions decode contract; no shuffle before the
    * presentation sort.
    */
  def payloadStats(t: Tables): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, p) =>
          val cnt = new Array[Long](256)
          p.foreach(b => cnt(b & 0xff) += 1)
          val n = p.length.toLong
          var nd = 0
          var mode = 0
          var mc = 0L
          var ss = 0L
          var i = 0
          while (i < 256) {
            val c = cnt(i)
            if (c > 0) {
              nd += 1
              if (c > mc) { mc = c; mode = i } // ascending i: ties keep the lowest byte
              ss += c * c
            }
            i += 1
          }
          (id, n, nd, ss.toDouble / (n.toDouble * n), mode, mc.toDouble / n)
        }
      }
      .toDF("doc_id", "byte_len", "n_distinct", "cp_raw", "mode_byte", "mf_raw")
      .select(col("doc_id"), col("byte_len"), col("n_distinct"),
        round(col("cp_raw"), 6).as("collision_prob"),
        col("mode_byte"), round(col("mf_raw"), 6).as("mode_frac"))
      .orderBy(col("doc_id"))
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
