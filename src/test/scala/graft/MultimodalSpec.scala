package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** m3 binary near-dup and the codegen thumbnail twin; m1/m2's results
  * are oracle-gated, their plan shapes locked in PlanShapeSpec.
  */
class MultimodalSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*): Tables = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_m3_")
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir.toString)
  }

  test("thumbSignatures is byte-equal to resizeStub on ASCII payloads") {
    val texts = Seq("hello world this is a payload of some length",
      "x", "abcdefghijklmnopqrstuvwxyz0123456789", "a b c d e f g h i j k")
    val t = docs(texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }: _*)
    val got = Multimodal.thumbSignatures(t, outLen = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    texts.zipWithIndex.foreach { case (s, i) =>
      val expect = Multimodal.resizeStub(s.getBytes("UTF-8"), 32).toSeq.map(_.toInt & 0xff)
      assert(got(i.toLong) == expect, s"doc $i: ${got(i.toLong)} vs $expect")
    }
  }

  test("m4: payload stats match brute-force byte accounting; degenerate payloads spike") {
    // a healthy varied payload vs a padding-corrupted one
    val t = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"), // 31×'a' + 'b'
      (3L, "xy"))
    val rows = Multimodal.payloadStats(t).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("byte_len"), r.getAs[Int]("n_distinct"),
          r.getAs[Double]("collision_prob"), r.getAs[Int]("mode_byte"),
          r.getAs[Double]("mode_frac")))).toMap
    def brute(s: String): (Long, Int, Double, Int, Double) = {
      val bytes = s.getBytes("UTF-8")
      val cnt = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong).toMap
      val n = bytes.length.toLong
      val ss = cnt.values.map(c => c * c).sum
      val (mode, mc) = cnt.toSeq.map { case (b, c) => (b, c) }
        .sortBy { case (b, c) => (-c, b) }.head
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, cnt.size, r6(ss.toDouble / (n.toDouble * n)), mode, r6(mc.toDouble / n))
    }
    assert(rows(1L) == brute("the quick brown fox jumps over the lazy dog"))
    assert(rows(2L) == brute("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"))
    assert(rows(3L) == brute("xy"))
    // the corruption signal orders as designed: padding >> prose
    assert(rows(2L)._3 > 0.9 && rows(2L)._5 > 0.9, "padding spikes collision prob and mode share")
    assert(rows(1L)._3 < 0.2, "varied prose stays low")
  }

  test("m3: exact duplicates pair at hamming 0; near-dups within the band gate; unrelated don't") {
    val base = "the quick brown fox jumps over the lazy dog again and again and again ok"
    // same length, one SAMPLED character changed (position picked from
    // the resample arithmetic, so the thumbnail actually differs) →
    // ≥3 of 4 bands still equal, small positive hamming; the unrelated
    // doc shares no band
    val sampledPos = (4L * base.length / 32).toInt
    val near = base.updated(sampledPos, 'X')
    val t = docs(1L -> base, 2L -> base, 3L -> near,
      4L -> "completely different content that resembles nothing in the others at all!")
    val out = Multimodal.binaryNearDup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3))).toSeq
    assert(out.contains((1L, 2L, 0, true)), s"exact dup must pair at hamming 0: $out")
    assert(out.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0 && p._4),
      s"near dup must pair with small positive hamming: $out")
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated doc must not pair: $out")
  }

  test("m3: the band-bucket guard fails loudly on a degenerate constant corpus") {
    val t = docs((1L to 30L).map(i => i -> "constant payload constant payload"): _*)
    val e = intercept[IllegalArgumentException] {
      Multimodal.binaryNearDup(t, maxBucket = 10)
    }
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
  }

  test("m5: representation-equal re-encodes collapse (bytes differ), byte-identical too, unique stays") {
    val long = ("the quick brown fox jumps over the lazy dog " * 3).trim // > 64 chars
    // same length, 2nd char flipped: for len > 64 the 32-slot sampler
    // touches positions 1 and >= 3 only, so the representation is equal
    val reenc = long.charAt(0) + "~" + long.substring(2)
    assert(reenc != long && reenc.length == long.length)
    val t = docs(
      1L -> long, 2L -> reenc,          // representation dup, bytes differ
      3L -> "some other document entirely different content here ok then",
      4L -> "byte identical pair payload text with enough length in it yes",
      5L -> "byte identical pair payload text with enough length in it yes")
    val got = Multimodal.thumbDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 1L, 2L), (5L, 4L, 2L)),
      s"expected the re-encode and the byte copy to collapse, got $got")
  }
}
