package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.sources.Tables

/** t13 BPE merge training: the operator's array-parity merge must equal a
  * straightforward scan-based reference implementation (the semantics the
  * Scaladoc pins), including the lhs == rhs overlap runs; plus
  * determinism and invariants on the real corpus.
  */
class BpeSpec extends SparkSpecBase {

  /** Reference greedy leftmost non-overlapping merge — the plain scan. */
  private def mergeScan(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Reference BPE trainer over (symbols, freq) rows. */
  private def naiveBpe(rows0: Seq[(Vector[String], Long)], n: Int): Seq[(String, String, Long)] = {
    var rows = rows0
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- rows; w <- syms.sliding(2) if w.size == 2)
        counts((w(0), w(1))) += f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        rows = rows.map { case (syms, f) => (mergeScan(syms, a, b), f) }
      }
    }
    out.result()
  }

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    texts.zipWithIndex
      .map { case (tx, i) => (i.toLong, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t13 equals the scan-based reference BPE on a crafted corpus with an overlap run") {
    // the classic Sennrich corpus plus 'aaaa' (the lhs == rhs run that
    // exercises greedy non-overlapping selection)
    val texts = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest",
      "aaaa aaaa aaaa aaaa aaaa aaaa aaaa")
    val words = texts.flatMap(_.split("\\s+")).groupBy(identity).toSeq
      .map { case (w, occ) => (w.map(_.toString).toVector :+ Bpe.EndMark, occ.size.toLong) }
    val expected = naiveBpe(words, 6).zipWithIndex
      .map { case ((a, b, c), i) => ((i + 1).toLong, a, b, a + b, c) }
    val got = Bpe.bpeMerges(Tables(spark, writeDocs(texts)), numMerges = 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("mergePair equals the scan merge on exhaustive short {a,b} arrays, both pair shapes") {
    import spark.implicits._
    val alphabet = Seq("a", "b")
    val arrays = (1 to 6).flatMap { n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(Vector.empty[String])) {
        (acc, alts) => acc.flatMap(v => alts.map(v :+ _))
      }
    }
    val df = arrays.map(Tuple1(_)).toDF("syms")
    for ((a, b) <- Seq(("a", "a"), ("a", "b"))) {
      val got = df.select(col("syms"), Bpe.mergePair(col("syms"), a, b).as("m"))
        .collect()
        .map(r => r.getSeq[String](0).toVector -> r.getSeq[String](1).toVector)
      got.foreach { case (in, out) =>
        assert(out == mergeScan(in, a, b), s"input $in pair ($a,$b)")
      }
    }
  }

  test("t14 encode equals the reference trainer's final dict on the crafted corpus") {
    val texts = Seq(
      "low low lower lowest",
      "newest newest widest",
      "aaaa aaaa low")
    val words0 = texts.flatMap(_.split("\\s+")).groupBy(identity).toSeq
      .map { case (w, occ) => (w, w.map(_.toString).toVector :+ Bpe.EndMark, occ.size.toLong) }
    // replay the reference trainer to get each word's final symbol count
    var rows = words0.map { case (_, syms, f) => (syms, f) }
    naiveBpe(rows, 6).foreach { case (a, b, _) =>
      rows = rows.map { case (syms, f) => (mergeScan(syms, a, b), f) }
    }
    val lenByWord = words0.map(_._1).zip(rows.map(_._1.length.toLong)).toMap
    val expected = texts.zipWithIndex.map { case (tx, i) =>
      val ws = tx.split("\\s+").toSeq
      (i.toLong, ws.size.toLong, ws.map(lenByWord).sum)
    }
    val got = Bpe.bpeEncode(Tables(spark, writeDocs(texts)), numMerges = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expected)
  }

  test("t14 on the real corpus: merges strictly compress and never drop words") {
    val t = Tables(spark, sfDir)
    val enc = Bpe.bpeEncode(t, numMerges = 8).collect()
    assert(enc.nonEmpty)
    // every word contributes at least one token, at most chars+1; merging
    // can only shrink, and 8 merges must shrink SOME doc
    enc.foreach { r => assert(r.getLong(2) >= r.getLong(1)) }
    val unmerged = Bpe.bpeEncode(t, numMerges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    var shrank = false
    enc.foreach { r =>
      val before = unmerged(r.getLong(0))
      assert(r.getLong(2) <= before)
      if (r.getLong(2) < before) shrank = true
    }
    assert(shrank)
  }

  test("a fully-merged vocabulary stops early: fewer steps than numMerges, 1 token per word") {
    // 'ab' exhausts after 2 merges (a+b, ab+</w>); rounds 3..8 find no
    // pair and must leave the dict unchanged (the oracle's LEFT JOIN ON
    // TRUE branch covers the same edge engine-side)
    val dir = writeDocs(Seq("ab ab", "ab"))
    val steps = Bpe.bpeMerges(Tables(spark, dir), numMerges = 8).collect()
    assert(steps.length == 2)
    assert(steps.map(_.getString(3)).toSeq == Seq("ab", "ab</w>"))
    val enc = Bpe.bpeEncode(Tables(spark, dir), numMerges = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc(0L) == ((2L, 2L)) && enc(1L) == ((1L, 1L)))
  }

  test("t13 on the real corpus: deterministic, well-formed, non-increasing best counts") {
    val t = Tables(spark, sfDir)
    val first = Bpe.bpeMerges(t, numMerges = 8).collect()
    assert(first.length == 8)
    first.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // a merge can only create pairs no more frequent than the pair it
    // merged, so the chosen counts are non-increasing
    val counts = first.map(_.getLong(4)).toSeq
    assert(counts == counts.sorted.reverse)
    val second = Bpe.bpeMerges(t, numMerges = 8).collect()
    assert(first.map(_.toString).toSeq == second.map(_.toString).toSeq)
  }
}
