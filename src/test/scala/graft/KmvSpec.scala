package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{GraftFunctions, GraftHash, GraftKmv, KmvState}

/** KMV bottom-k sketch (q29): exactness below k, the merge algebra
  * partial aggregation depends on, partition-order invariance through
  * the real aggregate, and estimator accuracy above k.
  */
class KmvSpec extends SparkSpecBase {

  private def samples[T](g: Gen[T], n: Int = 60): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private def build(keys: Seq[Long], k: Int = 16): KmvState = {
    val s = new KmvState(k)
    keys.foreach(v => s.add(GraftHash.splitmix64(v)))
    s
  }
  private def mergeInto(a: KmvState, b: KmvState): KmvState = {
    val it = b.hashes.iterator()
    while (it.hasNext) a.add(it.next())
    a
  }
  private def est(s: KmvState, k: Int): Long =
    GraftKmv.estimate(k, s.hashes.size, if (s.hashes.isEmpty) 0L else s.hashes.last())

  test("exact below k: the sketch IS the distinct count") {
    val keys = Seq(1L, 2L, 2L, 3L, 1L, 4L)
    assert(est(build(keys, 16), 16) == 4L)
    assert(est(build(Nil, 16), 16) == 0L)
  }

  test("merge of any split equals the direct build (partial-agg correctness)") {
    val keysGen = Gen.listOfN(300, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    samples(keysGen.flatMap(ks => Gen.chooseNum(0, 300).map(ks -> _))).foreach {
      case (keys, cut) =>
        val whole = build(keys)
        val merged = mergeInto(build(keys.take(cut)), build(keys.drop(cut)))
        assert(merged.hashes.equals(whole.hashes))
        assert(est(merged, 16) == est(whole, 16))
    }
  }

  test("merge is commutative; duplicates and order never change the state") {
    val keysGen = Gen.listOfN(120, Gen.chooseNum(-500L, 500L))
    samples(keysGen).foreach { keys =>
      val ab = mergeInto(build(keys.take(60)), build(keys.drop(60)))
      val ba = mergeInto(build(keys.drop(60)), build(keys.take(60)))
      assert(ab.hashes.equals(ba.hashes), "commutativity")
      assert(build(keys).hashes.equals(build(keys ++ keys.reverse).hashes), "dup/order")
    }
  }

  test("estimator above k: within ~6·σ of truth and invariant to partitioning") {
    import spark.implicits._
    val n = 10000
    val df = (0 until n).flatMap(i => Seq(i.toLong, i.toLong)).toDF("uid")
    def run(parts: Int): Long =
      df.repartition(parts)
        .agg(GraftFunctions.kmv_distinct(col("uid"), 256).as("e"))
        .collect()(0).getLong(0)
    val e = run(4)
    assert(run(13) == e, "partitioning must not change the estimate")
    // k=256 ⇒ σ ≈ n/√(k−2) ≈ 6.3%; 6σ ≈ 38%
    assert(math.abs(e - n) < n * 0.38, s"estimate $e vs true $n")
  }

  test("clamp: a pathologically small h_k cannot overflow the BIGINT estimate") {
    assert(GraftKmv.estimate(k = 256, nHeld = 256, hk = 1L) == Long.MaxValue)
    assert(GraftKmv.estimate(k = 256, nHeld = 256, hk = -1L) == 255L) // h_k = 2^64−1
  }

  test("q30 overlap: EXACT when both sketches are exhaustive (below k)") {
    import spark.implicits._
    // A = {0..99}, B = {50..149}: true |A∩B| = 50, |A∪B| = 150 < k
    val df = ((0 until 100).map(i => ("a", i.toLong)) ++
      (50 until 150).map(i => ("b", i.toLong))).toDF("g", "uid")
    val sk = df.groupBy("g").agg(GraftFunctions.kmv_sketch(col("uid"), 256).as("sk"))
    val row = sk.filter($"g" === "a").crossJoin(sk.filter($"g" === "b").select($"sk".as("sk2")))
      .select(GraftFunctions.kmv_overlap($"sk", $"sk2").as("o"))
      .select($"o.inter_k", $"o.est_union", $"o.est_shared").collect()(0)
    assert(row.getInt(0) == 50 && row.getLong(1) == 150L && row.getDouble(2) == 50.0)
  }

  test("q30 overlap: above k the estimate lands near truth, invariant to partitioning") {
    import spark.implicits._
    // A = {0..9999}, B = {5000..14999}: truth |A∩B| = 5000
    val df = ((0 until 10000).map(i => ("a", i.toLong)) ++
      (5000 until 15000).map(i => ("b", i.toLong))).toDF("g", "uid")
    def run(parts: Int): (Long, Double) = {
      val sk = df.repartition(parts).groupBy("g")
        .agg(GraftFunctions.kmv_sketch(col("uid"), 256).as("sk"))
      val r = sk.filter($"g" === "a").crossJoin(sk.filter($"g" === "b").select($"sk".as("sk2")))
        .select(GraftFunctions.kmv_overlap($"sk", $"sk2").as("o"))
        .select($"o.est_union", $"o.est_shared").collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    val (estU, estS) = run(4)
    assert(run(11) == ((estU, estS)), "partitioning must not change the sketches")
    assert(math.abs(estU - 15000L) < 15000 * 0.4, s"union est $estU vs 15000")
    // ρ has binomial noise on top of the union estimate — generous 6σ-ish gate
    assert(math.abs(estS - 5000.0) < 5000 * 0.6, s"overlap est $estS vs 5000")
  }
}
