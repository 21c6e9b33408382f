package graft

import org.scalacheck.Gen

import graft.functions.{GraftHash, HllDistinct, HllRegisters, HllWire, SpaceSavingSketch}

/** Property-based checks of the sketch algebra — the laws the 100 TB
  * execution model depends on: partial aggregation is only correct if
  * merge is associative and commutative and serialization round-trips,
  * for ANY partition layout, not just the ones the example specs hit.
  */
class SketchPropertiesSpec extends SparkSpecBase {

  // scalacheck generators driven manually (no scalatest bridge in the
  // offline cache): draw N samples per law
  private def samples[T](g: Gen[T], n: Int = 60): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => f(a, b) }
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(g1).lazyZip(samples(g2)).lazyZip(samples(g3)).foreach { case (a, b, c) => f(a, b, c) }

  private val keysGen: Gen[List[Long]] =
    Gen.listOfN(300, Gen.chooseNum(Long.MinValue, Long.MaxValue))

  private def build(keys: Seq[Long], p: Int = 6): HllRegisters = {
    val r = new HllRegisters(p)
    keys.foreach(k => r.addHash(GraftHash.splitmix64(k)))
    r
  }

  test("HLL merge is commutative and associative (any partition layout, same result)") {
    forAll(keysGen, keysGen, keysGen) { (a: List[Long], b: List[Long], c: List[Long]) =>
      val ab = build(a); ab.merge(build(b))
      val ba = build(b); ba.merge(build(a))
      assert(ab.regs.sameElements(ba.regs), "commutativity")

      val abThenC = build(a); abThenC.merge(build(b)); abThenC.merge(build(c))
      val aThenBc = build(a)
      val bc = build(b); bc.merge(build(c))
      aThenBc.merge(bc)
      assert(abThenC.regs.sameElements(aThenBc.regs), "associativity")
    }
  }

  test("HLL merge of any split equals the direct build (partial-agg correctness)") {
    forAll(keysGen, Gen.chooseNum(0, 300)) { (keys: List[Long], cut: Int) =>
      val whole = build(keys)
      val left = build(keys.take(cut))
      left.merge(build(keys.drop(cut)))
      assert(left.regs.sameElements(whole.regs))
      assert(left.estimate == whole.estimate)
    }
  }

  test("HLL estimate is insensitive to duplicates and input order") {
    forAll(keysGen) { keys: List[Long] =>
      val once = build(keys)
      val shuffledDup = build(scala.util.Random.shuffle(keys ++ keys ++ keys.take(10)))
      assert(once.regs.sameElements(shuffledDup.regs))
    }
  }

  test("HLL wire format round-trips exactly") {
    forAll(keysGen, Gen.oneOf(4, 6, 8, 12)) { (keys: List[Long], p: Int) =>
      val r = build(keys, p)
      val back = HllWire.fromBytes(HllWire.toBytes(r))
      assert(back.p == r.p && back.regs.sameElements(r.regs))
      assert(HllWire.estimateBytes(HllWire.toBytes(r)) == r.estimate)
    }
  }

  test("HLL rank stays within [1, K] for arbitrary hashes and precisions") {
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.oneOf(4, 6, 10, 16)) {
      (h: Long, p: Int) =>
        val r = HllDistinct.rank(h, p)
        assert(r >= 1 && r <= HllDistinct.maxRank(p))
    }
  }

  test("SpaceSaving counts never underestimate the true frequency") {
    val tokGen = Gen.listOfN(400, Gen.oneOf((1 to 25).map(i => s"t$i")))
    forAll(tokGen) { toks: List[String] =>
      val sk = new SpaceSavingSketch(8) // capacity << 25 distinct: eviction pressure
      toks.foreach(sk.add(_))
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sk.counts.foreach { case (t, (c, _)) =>
        assert(c >= truth.getOrElse(t, 0L), s"retained count for $t underestimates")
      }
    }
  }

  test("SpaceSaving merge keeps the overestimate guarantee") {
    val tokGen = Gen.listOfN(200, Gen.oneOf((1 to 20).map(i => s"t$i")))
    forAll(tokGen, tokGen) { (a: List[String], b: List[String]) =>
      val sa = new SpaceSavingSketch(8); a.foreach(sa.add(_))
      val sb = new SpaceSavingSketch(8); b.foreach(sb.add(_))
      sa.merge(sb)
      val truth = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong).toMap
      sa.counts.foreach { case (t, (c, _)) =>
        assert(c >= truth.getOrElse(t, 0L), s"merged count for $t underestimates")
      }
    }
  }

  test("Bloom filter never false-negatives; OR-merge equals direct build") {
    import graft.functions.GraftBloom
    forAll(keysGen, keysGen) { (members: List[Long], probesRaw: List[Long]) =>
      val nbits = 1 << 12
      val words = new Array[Long](nbits / 64)
      members.foreach(GraftBloom.set(words, nbits, 4, _))
      members.foreach(m => assert(GraftBloom.probe(words, nbits, 4, m), "member must probe true"))

      // split build + OR == whole build
      val (l, r) = members.splitAt(members.size / 2)
      val wl = new Array[Long](nbits / 64)
      val wr = new Array[Long](nbits / 64)
      l.foreach(GraftBloom.set(wl, nbits, 4, _))
      r.foreach(GraftBloom.set(wr, nbits, 4, _))
      val merged = wl.zip(wr).map { case (x, y) => x | y }
      assert(merged.sameElements(words))

      // wire round-trip preserves every probe outcome
      val bytes = GraftBloom.toBytes(nbits, 4, words)
      val (nb2, k2, w2) = GraftBloom.fromBytes(bytes)
      probesRaw.foreach { q =>
        assert(GraftBloom.probe(w2, nb2, k2, q) == GraftBloom.probe(words, nbits, 4, q))
      }
    }
  }

  test("input validation: fractional HLL inputs and malformed Bloom probes are rejected") {
    import spark.implicits._
    import org.apache.spark.sql.AnalysisException
    import org.apache.spark.sql.functions.col
    import graft.functions.GraftFunctions

    // DOUBLE children would silently truncate via Number.longValue (1.2
    // and 1.9 collapse to one register update) — analysis-time rejection
    val doubles = Seq(1.2, 1.9, 2.5).toDF("d")
    val e1 = intercept[AnalysisException] {
      doubles.agg(GraftFunctions.hll_distinct(col("d"), 8)).collect()
    }
    assert(e1.getMessage.contains("hll_distinct"), e1.getMessage)
    val e2 = intercept[AnalysisException] {
      doubles.agg(GraftFunctions.hll_sketch(col("d"), 8)).collect()
    }
    assert(e2.getMessage.contains("hll_sketch"), e2.getMessage)
    // an explicit cast is the documented opt-in to truncation
    doubles.agg(GraftFunctions.hll_distinct(col("d").cast("long"), 8)).collect()

    // bloom_hits over array<int> would read garbage bits via getLong —
    // rejected at analysis time, mirroring bloom_build's input check
    val filter = Seq(1L, 2L).toDF("k")
      .agg(GraftFunctions.bloom_build(col("k"), 256, 2))
      .collect()(0).getAs[Array[Byte]](0).toSeq
    val intArrays = Seq(Seq(1, 2)).toDF("a")
    val e3 = intercept[AnalysisException] {
      intArrays.select(GraftFunctions.bloom_hits(col("a"), filter)).collect()
    }
    assert(e3.getMessage.toLowerCase.contains("array<bigint>"), e3.getMessage)

    // wire-header validation: blobs that are not bloom_build output
    // refuse construction instead of probing a garbage bit array
    val longArrays = Seq(Seq(1L, 2L)).toDF("a")
    val eShort = intercept[IllegalArgumentException] {
      GraftFunctions.bloom_hits(col("a"), Seq[Byte](1, 2, 3))
    }
    assert(eShort.getMessage.contains("header"), eShort.getMessage)
    val eTrunc = intercept[IllegalArgumentException] {
      GraftFunctions.bloom_hits(col("a"), filter.dropRight(1))
    }
    assert(eTrunc.getMessage.contains("bytes"), eTrunc.getMessage)
    // the untampered filter still probes fine over ARRAY<BIGINT>
    assert(longArrays.select(GraftFunctions.bloom_hits(col("a"), filter))
      .collect()(0).getInt(0) == 2)
  }

  test("MinHash signature agreement is symmetric and bounded by signature length") {
    val tokGen = Gen.listOfN(30, Gen.oneOf((1 to 40).map(i => s"w$i")))
    forAll(tokGen, tokGen) { (a: List[String], b: List[String]) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      def sig(ts: List[String]) = GraftHash.shingleMinHash(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]), 2, 64, 42L)
      val (sa, sb) = (sig(a), sig(b))
      val ab = GraftHash.sigAgreement(sa, sb)
      assert(ab == GraftHash.sigAgreement(sb, sa))
      assert(ab >= 0 && ab <= 64)
      assert(GraftHash.sigAgreement(sa, sa) == 64, "self-agreement is total")
    }
  }
}
