package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}
import graft.sources.Tables

/** Functional specs for the round-7 additions: the unigram-LM quality
  * proxy (t8), PII redaction (t9) and the corpus kNN graph (s4).
  */
class TextExtraSpec extends SparkSpecBase {

  private lazy val t = Tables(spark, sfDir)

  test("covered_tokens: interval union edge cases (overlap, adjacency, gap, tail)") {
    import spark.implicits._
    // k=3 windows at 1-based positions of hot hashes; shingle i covers [i+1, i+3]
    def cov(hashes: Seq[Long], hot: Seq[Long]): Long =
      Seq(Tuple1(hashes)).toDF("sh")
        .select(graft.functions.GraftFunctions.covered_tokens(col("sh"), hot, 3).as("c"))
        .collect()(0).getLong(0)
    assert(cov(Seq(1L, 2L, 3L), Seq()) == 0L, "empty hot set covers nothing")
    assert(cov(Seq(9L, 9L, 9L), Seq(1L)) == 0L, "no hit covers nothing")
    assert(cov(Seq(1L, 9L, 9L), Seq(1L)) == 3L, "single window covers k tokens")
    assert(cov(Seq(1L, 1L, 9L), Seq(1L)) == 4L, "overlapping windows merge")
    assert(cov(Seq(1L, 9L, 9L, 1L), Seq(1L)) == 6L, "adjacent windows [1,3][4,6] merge seamlessly")
    assert(cov(Seq(1L, 9L, 9L, 9L, 1L), Seq(1L)) == 6L, "a gap splits islands: [1,3] + [5,7]")
    assert(cov(Seq(9L, 9L, 9L, 1L), Seq(1L)) == 3L, "trailing island is flushed")
  }

  // ---------------------------------------------------------------- t8

  test("t8 unigram logprob matches hand-computed values on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t8crafted").toString
    Seq(
      (0L, "a a", "en", "src0", 3L),
      (1L, "a b", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // corpus: ctf(a)=3, ctf(b)=1, total=4
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = TextAnalysis.unigramLogprob(Tables(spark, dir)).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    assert(byId(0L) == ((2L, r6(math.log(3.0 / 4.0)))))
    assert(byId(1L) == ((2L, r6((math.log(3.0 / 4.0) + math.log(1.0 / 4.0)) / 2.0))))
  }

  test("t8 on the real corpus: every score is negative and rare-token docs score lower") {
    val rows = TextAnalysis.unigramLogprob(t).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Double]("avg_logprob") < 0.0),
      "ln P(token) < 0 for every non-certain token")
    // sanity: scores spread — a corpus-frequency signal, not a constant
    val scores = rows.map(_.getAs[Double]("avg_logprob"))
    assert(scores.max - scores.min > 0.01, "scores must discriminate between docs")
  }

  test("t12 bigram logprob matches hand-computed values on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t12crafted").toString
    Seq(
      (0L, "a b a b", "en", "src0", 7L),
      (1L, "b a", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // tokens: doc0 = a b a b, doc1 = b a → cu(a)=3, cu(b)=3, N=6
    // bigrams: ab ba ab (doc0), ba (doc1) → cb(ab)=2, cb(ba)=2
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 0.75 * 2.0 / 3.0 + 0.25 * 3.0 / 6.0 // p(b|a) interpolated
    val pBA = 0.75 * 2.0 / 3.0 + 0.25 * 3.0 / 6.0
    val first = math.log(3.0 / 6.0)
    val byId = TextAnalysis.bigramLogprob(Tables(spark, dir)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob")))).toMap
    assert(byId(0L) == ((4L, r6((first + 2 * math.log(pAB) + math.log(pBA)) / 4.0))))
    assert(byId(1L) == ((2L, r6((first + math.log(pBA)) / 2.0))))
  }

  test("t12 on the real corpus: scores negative, and context beats the unigram floor") {
    val rows = TextAnalysis.bigramLogprob(t).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Double]("avg_logprob") < 0.0))
    // the interpolated bigram prob of an observed pair is at least
    // (1-λ)·p1(w2), so a doc's t12 score has a hard floor of its t8
    // score + ln(0.25) — and on real text context should usually WIN
    // over the raw unigram score
    val t8 = TextAnalysis.unigramLogprob(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    val t12 = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    val wins = t12.count { case (id, s) => s > t8(id) }
    assert(wins > t12.size / 2,
      s"bigram context should beat unigram scoring for most docs (won $wins/${t12.size})")
  }

  test("t16 PMI matches the hand formula and ranks the glued pair first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t16crafted").toString
    // 'new york' always co-occurs (6 times); 'the' pairs freely with
    // several continuations, so p(city|the) < 1 and its PMI is lower
    val texts = Seq(
      (0L, "new york the port the dock the fog", "en", "src0", 9L),
      (1L, "new york the city the dock", "en", "src0", 9L),
      (2L, "new york the city new york", "en", "src0", 9L),
      (3L, "new york new york the city", "en", "src0", 9L))
    texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val allToks = texts.flatMap(_._2.split(" "))
    val n = allToks.size.toDouble
    val bigrams = texts.flatMap(_._2.split(" ").sliding(2).map(p => (p(0), p(1))))
    val nb = bigrams.size.toDouble
    val cu = allToks.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val cbNY = bigrams.count(_ == ("new", "york")).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = r6(math.log(cbNY * n * n / (nb * cu("new") * cu("york"))))
    val rows = TextAnalysis.pmiCollocations(Tables(spark, dir), minCount = 2, k = 10).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getString(0), top.getString(1)) == (("new", "york")))
    assert(top.getLong(2) == cbNY.toLong)
    assert(top.getDouble(3) == expected)
    // the free-floating 'the city' pair scores strictly lower
    val theCity = rows.find(r => r.getString(0) == "the" && r.getString(1) == "city")
    theCity.foreach(r => assert(r.getDouble(3) < top.getDouble(3)))
  }

  test("t16 on the real corpus: thresholded, descending, at most k rows") {
    val rows = TextAnalysis.pmiCollocations(t).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getLong(2) >= 5L))
    val pmis = rows.map(_.getDouble(3)).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  test("t10 token entropy matches hand-computed values and bounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t10crafted").toString
    Seq(
      (0L, "a b c d", "en", "src0", 7L),        // uniform: H = ln 4, norm = 1
      (1L, "x x x x", "en", "src0", 7L),        // constant: H = 0, norm = 0
      (2L, "a a a b", "en", "src0", 7L))        // skewed: H = -(3/4 ln 3/4 + 1/4 ln 1/4)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.TextAnalysis.tokenEntropy(Tables(spark, dir)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("token_entropy"), r.getAs[Double]("norm_entropy")))).toMap
    assert(rows(0L) == ((r6(math.log(4.0)), 1.0)))
    assert(rows(1L) == ((0.0, 0.0)))
    val hSkew = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(rows(2L) == ((r6(hSkew), r6(hSkew / math.log(2.0)))))

    // real corpus: entropy in [0, ln distinct], norm in [0, 1]
    val real = graft.operators.TextAnalysis.tokenEntropy(t).collect()
    assert(real.length == 500)
    real.foreach { r =>
      val h = r.getAs[Double]("token_entropy"); val nm = r.getAs[Double]("norm_entropy")
      assert(h >= 0.0 && h <= math.log(r.getAs[Long]("distinct_tokens").toDouble) + 1e-6)
      assert(nm >= 0.0 && nm <= 1.0 + 1e-9)
    }
  }

  // ---------------------------------------------------------------- t9

  private def redactOne(s: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = TextAnalysis.piiRedact(Seq(s).toDF("text"), col("text")).collect().head
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"),
      r.getAs[String]("redacted"))
  }

  test("t9 finds and redacts emails, phones and IPv4 addresses") {
    assert(redactOne("reach jane.doe+x@example.org today") ==
      ((1L, 0L, 0L, "reach <EMAIL> today")))
    assert(redactOne("call 555-123-4567 or 555-000-9999") ==
      ((0L, 2L, 0L, "call <PHONE> or <PHONE>")))
    assert(redactOne("server 192.168.1.100 is down") ==
      ((0L, 0L, 1L, "server <IP> is down")))
    assert(redactOne("a@b.io then 10.0.0.1 then 555-111-2222") ==
      ((1L, 1L, 1L, "<EMAIL> then <IP> then <PHONE>")))
  }

  test("t9 leaves clean text untouched and is idempotent on redacted text") {
    val clean = "no personal information in this sentence"
    assert(redactOne(clean) == ((0L, 0L, 0L, clean)))
    val (_, _, _, once) = redactOne("write a@b.io or 1.2.3.4")
    assert(redactOne(once) == ((0L, 0L, 0L, once)), "redaction is a fixpoint")
  }

  test("t9 queries row synthesizes exactly one of each PII kind per document") {
    val rows = TextAnalysis.piiScrub(t).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Long]("n_emails") == 1L &&
      r.getAs[Long]("n_phones") == 1L && r.getAs[Long]("n_ips") == 1L),
      "the synthesized contact line carries one email, one phone, one IPv4")
  }

  test("t9 property: injected PII is counted and redacted exactly, for any arrangement") {
    import org.scalacheck.Gen
    import spark.implicits._
    // base words are letters-only, so the ONLY matchable substrings are
    // the injected tokens — expected counts are exact by construction
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val email = for {
      l <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
      d <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
      tld <- Gen.oneOf("com", "org", "io")
    } yield (s"$l@$d.$tld", "<EMAIL>")
    val phone = for {
      a <- Gen.chooseNum(0, 999); b <- Gen.chooseNum(0, 999); c <- Gen.chooseNum(0, 9999)
    } yield (f"$a%03d-$b%03d-$c%04d", "<PHONE>")
    val ip = Gen.listOfN(4, Gen.chooseNum(0, 255)).map(o => (o.mkString("."), "<IP>"))
    val token: Gen[(String, String, Int)] = Gen.frequency(
      5 -> word.map(w => (w, w, 0)),
      1 -> email.map { case (s, r) => (s, r, 1) },
      1 -> phone.map { case (s, r) => (s, r, 2) },
      1 -> ip.map { case (s, r) => (s, r, 3) })
    val rowGen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, token)).map { toks =>
      val text = toks.map(_._1).mkString(" ")
      val expected = toks.map(_._2).mkString(" ")
      val counts = (1 to 3).map(k => toks.count(_._3 == k).toLong)
      (text, expected, counts(0), counts(1), counts(2))
    }
    val cases = Iterator.continually(rowGen.sample).flatten.take(80).toSeq
    val got = graft.operators.TextAnalysis.piiRedact(
        cases.map(_._1).toDF("text"), org.apache.spark.sql.functions.col("text"))
      .select("text", "n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getString(4)))).toMap
    cases.foreach { case (text, expected, ne, np, ni) =>
      assert(got(text) == ((ne, np, ni, expected)),
        s"mismatch for input '$text': got ${got(text)}, want ($ne,$np,$ni,'$expected')")
    }
  }

  // ---------------------------------------------------------------- s4

  test("s4 kNN graph: ranks contiguous, no self-edges, cosine non-increasing, pairs band-collide") {
    val rows = Similarity.knnGraph(t).collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    byVec.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(1 to g.length),
        "ranks are 1..n with no gaps")
      val cos = sorted.map(_.getAs[Double]("cos"))
      assert(cos.sameElements(cos.sortBy(-(_: Double))), "ranked by cosine desc")
      assert(g.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("vec_id")))
    }
    // every edge genuinely collides on a 4-bit band — the bucketing, not
    // a fallback scan, produced the candidates
    val sk = t.embeddings
      .select(col("vec_id"), graft.functions.GraftFunctions.sign_sketch(col("embedding"), 16, 7L).as("sk"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sk")).toMap
    rows.foreach { r =>
      val a = sk(r.getAs[Long]("vec_id")); val b = sk(r.getAs[Long]("neighbor_id"))
      assert((0 until 4).exists(i => ((a >> (4 * i)) & 15L) == ((b >> (4 * i)) & 15L)),
        s"edge ${r} does not share any sketch band")
    }
  }

  test("s4 kNN graph: edge recall vs brute-force top-k is reasonable") {
    val emb = t.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val k = 3
    val brute = emb.keys.flatMap { v =>
      emb.keys.filter(_ != v).toSeq
        .map(n => (n, cos(emb(v), emb(n))))
        .sortBy { case (n, c) => (-c, n) }.take(k)
        .map { case (n, _) => (v, n) }
    }.toSet
    val lsh = Similarity.knnGraph(t).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"kNN-graph recall $recall vs brute force too low for 4x4-bit bands")
  }

  test("s4 kNN graph: maxBucketSize fails loudly on a degenerate constant-embedding corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s4degenerate").toString
    // identical vectors: every sketch bit agrees, all 500 land in ONE
    // bucket per band — the silent-quadratic shape the guard names
    (0L until 500L).map(i => (i, Array.fill(8)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val t2 = Tables(spark, dir)
    val e = intercept[IllegalStateException] {
      Similarity.knnGraph(t2, maxBucketSize = Some(100L))
    }
    assert(e.getMessage.contains("maxBucketSize=100") && e.getMessage.contains("500"),
      s"guard must name the violating bucket: ${e.getMessage}")
    // under the cap, the guard stays silent and the graph still builds
    assert(Similarity.knnGraph(t, maxBucketSize = Some(100000L)).collect().nonEmpty)
  }

  test("s4 guard defaults ON: a bucket past QuadraticGuardDefault fails with NO explicit bound") {
    val dir = java.nio.file.Files.createTempDirectory("s4defaultguard").toString
    spark.range(0, operators.QuadraticGuardDefault + 1007)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(1.0f)).as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] { Similarity.knnGraph(Tables(spark, dir)) }
    assert(e.getMessage.contains("maxBucketSize"),
      s"default guard must fire on the degenerate corpus: ${e.getMessage}")
  }

  test("s4 kNN graph: an undirected pair scores identically from both endpoints") {
    val rows = Similarity.knnGraph(t).collect()
    val cosOf = rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")) ->
      r.getAs[Double]("cos")).toMap
    val mirrored = cosOf.keys.filter(p => cosOf.contains((p._2, p._1)))
    assert(mirrored.nonEmpty, "at least one pair appears in both endpoints' top-k")
    mirrored.foreach(p => assert(cosOf(p) == cosOf((p._2, p._1)),
      s"cos asymmetry on $p"))
  }

  test("t18 Zipf fit matches a brute-force OLS and slopes downward on the real corpus") {
    val row = TextAnalysis.zipfFit(t).collect()(0)
    val slope = row.getAs[Double]("zipf_slope")
    assert(slope < 0, "token frequencies must decay with rank")
    // brute force: same rounding-then-exact-sum arithmetic driver-side
    def r8(v: Double) = BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = t.documents.select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (tok, xs) => (tok, xs.length.toLong) }.toSeq
    val head = counts.sortBy { case (tok, n) => (-n, tok) }.take(1000)
    val pts = head.zipWithIndex.map { case ((_, n), i) =>
      val x = r8(math.log((i + 1).toDouble)); val y = r8(math.log(n.toDouble))
      (x, y, r8(x * x), r8(x * y))
    }
    val k = pts.length.toDouble
    def s(f: ((Double, Double, Double, Double)) => Double) =
      pts.map(p => BigDecimal(f(p))).sum.toDouble
    val (sx, sy, sxx, sxy) = (s(_._1), s(_._2), s(_._3), s(_._4))
    val expSlope = BigDecimal((k * sxy - sx * sy) / (k * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n_types") == pts.length)
    assert(math.abs(slope - expSlope) < 2e-6, s"slope $slope vs brute $expSlope")
  }

  test("t17 BM25 matches a brute-force recomputation on the collected corpus") {
    val terms = TextAnalysis.Bm25QueryTerms
    val docs = t.documents.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = terms.map(q => q -> docs.count(_._2.contains(q)).toDouble).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.flatMap { case (id, toks) =>
      val s = terms.map { q =>
        val tf = toks.count(_ == q).toDouble
        if (tf == 0) 0.0
        else r6(math.log((n - df(q) + 0.5) / (df(q) + 0.5) + 1.0) *
          (tf * (TextAnalysis.Bm25K1 + 1.0)) /
          (tf + TextAnalysis.Bm25K1 * (1.0 - TextAnalysis.Bm25B +
            TextAnalysis.Bm25B * toks.length / avgdl)))
      }.sum
      if (s > 0) Some(id -> r6(s)) else None
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = TextAnalysis.bm25(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(got == expected.toSeq, "top-20 BM25 ranking matches brute force")
  }

  test("s7 RRF fuses both legs, tolerates single-modality docs, and is rank-monotone") {
    val rows = Similarity.hybridRrf(t).collect()
    assert(rows.length == 10)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.sameElements(rrfs.sortBy(-(_: Double))), "presentation order is fused-score order")
    rows.foreach { r =>
      val rv = Option(r.getAs[Any]("r_vec")).map(_.asInstanceOf[Int])
      val rt = Option(r.getAs[Any]("r_text")).map(_.asInstanceOf[Int])
      val exp = rv.map(x => BigDecimal(1.0 / (60 + x)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).getOrElse(0.0) +
        rt.map(x => BigDecimal(1.0 / (60 + x)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - exp) < 1e-12,
        s"doc ${r.getAs[Long]("doc_id")} rrf = sum of leg terms")
      assert(rv.isDefined || rt.isDefined)
    }
    // the fused list must not be either single leg verbatim: a doc
    // ranked high by BOTH legs should beat one ranked 1st by one leg
    // only whenever both-leg terms dominate — structural sanity: at
    // least one row carries both ranks
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("r_vec")) && !r.isNullAt(r.fieldIndex("r_text"))))
  }

  // --------------------------------------------------------------- t19

  test("t19 KL drift matches hand-computed divergence on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t19crafted").toString
    Seq(
      (0L, "a a b", "en", "src0", 5L),
      (1L, "b c", "en", "src1", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // src0: a:2 b:1 (n_s=3); src1: b:1 c:1 (n_s=2); corpus: a:2 b:2 c:1 (N=5)
    def rd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(cst: Long, ns: Long, ct: Long, n: Long): Double =
      rd(cst.toDouble / ns.toDouble *
        rd(math.log(cst.toDouble * n.toDouble / (ns.toDouble * ct.toDouble)), 8), 10)
    val exp0 = rd(term(2, 3, 2, 5) + term(1, 3, 2, 5), 6)
    val exp1 = rd(term(1, 2, 2, 5) + term(1, 2, 1, 5), 6)
    val got = TextAnalysis.klDrift(Tables(spark, dir)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("kl_divergence"))).toMap
    assert(got == Map("src0" -> ((3L, exp0)), "src1" -> ((2L, exp1))))
    assert(exp0 > 0 && exp1 > 0, "drifted sources diverge strictly")
  }

  test("t19 drift-vs-reference equals klDrift when the reference IS the corpus; OOV counted honestly") {
    import spark.implicits._
    val (refCounts, refTotal) = TextAnalysis.klReferenceModel(t)
    val got = TextAnalysis.klDriftAgainst(
        t.documents.select(col("doc_id"), col("source"), col("text")), refCounts, refTotal)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_tokens"), r.getAs[Double]("kl_vs_ref"))))
      .toMap
    val want = TextAnalysis.klDrift(t).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("kl_divergence")))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (src, (n, oov, kl)) =>
      assert(oov == 0L, s"$src: reference covers its own corpus")
      assert((n, kl) == want(src), s"$src: self-reference drift must equal klDrift")
    }
    // a batch with tokens the reference never saw: OOV counted, seen-token KL finite
    val seen = t.documents
      .select(explode(graft.functions.GraftFunctions.ws_tokens(col("text"))).as("tk"))
      .filter(col("tk") =!= "").limit(1).collect()(0).getString(0)
    val batch = Seq((9000L, "srcX", s"$seen $seen zzznever zzzseen"))
      .toDF("doc_id", "source", "text")
    val row = TextAnalysis.klDriftAgainst(batch, refCounts, refTotal).collect()(0)
    assert(row.getAs[Long]("n_tokens") == 4L && row.getAs[Long]("oov_tokens") == 2L)
    assert(!row.isNullAt(row.fieldIndex("kl_vs_ref")))
  }

  test("t20 textrank: the hub word of a star-shaped co-occurrence graph ranks first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t20crafted").toString
    // adjacency pairs: (a,b) (a,c) (a,d) after lexical dedup — a star
    // centered on 'a'; plus an isolated pair (x,y) off to the side
    Seq((0L, "a b a c a d", "en", "s", 11L), (1L, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textrankKeywords(Tables(spark, dir), topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._1 == "a", s"the star hub must rank first, got ${rows.toSeq}")
    val byWord = rows.map(r => r._1 -> r._2).toMap
    assert(byWord("a") == 3L && byWord("b") == 1L && byWord("x") == 1L,
      "degrees count distinct co-occurrence partners")
    val ranks = rows.map(_._3)
    assert(ranks.sameElements(ranks.sortBy(-(_: Long))), "presentation is rank-descending")
    assert(byWord("x") == byWord("y"), "symmetric pair words tie in degree")
  }

  test("t20 textrank on the corpus: topK rows, distinct words, rank-ordered") {
    val rows = TextAnalysis.textrankKeywords(t).collect()
    assert(rows.length == 30)
    val words = rows.map(_.getString(0))
    assert(words.distinct.length == words.length)
    val ranks = rows.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-(_: Long))))
    assert(rows.forall(_.getLong(1) >= 1L))
  }

  test("t19: corpus KL divergences are non-negative (Gibbs) within the rounding envelope") {
    val rows = TextAnalysis.klDrift(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getAs[Double]("kl_divergence")
      // exact KL >= 0; the 8/10-dp term rounding can introduce at most
      // vocabulary-size x 5e-11 of signed error
      assert(kl >= -1e-5, s"${r.getString(0)}: KL $kl below the rounding floor")
    }
    assert(rows.exists(_.getAs[Double]("kl_divergence") > 0),
      "sources genuinely differ from the blend")
  }

  test("t19 KL drift is zero when one source IS the corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t19single").toString
    Seq((0L, "x y z x", "en", "only", 7L), (1L, "y x", "en", "only", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.klDrift(Tables(spark, dir)).collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("kl_divergence") == 0.0 &&
      rows(0).getAs[Long]("n_tokens") == 6L)
  }
}
