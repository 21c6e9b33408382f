package graft

import graft.operators.{ProductQuant, Similarity}
import graft.sources.Tables

/** s5 PQ-ADC: shape/determinism invariants + retrieval sanity vs brute. */
class ProductQuantSpec extends SparkSpecBase {

  private lazy val t = Tables(spark, sfDir)

  test("s5: ten queries, contiguous ranks 1..k, no self-matches") {
    val rows = ProductQuant.pqTopK(t).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"query $q ranks not contiguous")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("s5 is bit-deterministic across runs (quantized integer train/encode/score)") {
    val a = ProductQuant.pqTopK(t).collect().map(_.toString).sorted.toSeq
    val b = ProductQuant.pqTopK(t).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("s5 sample-bounded training (trainSize < corpus) still yields a full valid result") {
    // the 100 TB path: codebooks from an id-prefix sample, whole corpus
    // encoded against the broadcast books — results keep the s-family
    // contract (all queries answered, ranks contiguous) and re-run
    // identically
    val a = ProductQuant.pqTopK(t, trainSize = 64L).collect()
    assert(a.groupBy(_.getAs[Long]("query_id")).forall { case (_, rs) =>
      rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5) })
    val b = ProductQuant.pqTopK(t, trainSize = 64L).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("s5 recall@5 vs exact brute force stays high on the test corpus") {
    // 16^4 PQ cells over 500 vectors + 64-candidate exact rerank: the
    // approximation should rarely lose a true top-5 neighbor. The bound
    // is deliberately below observed (pins regressions, not noise — the
    // operator is deterministic so the measured value is stable).
    val brute = Similarity.bruteForce(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val pq = ProductQuant.pqTopK(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.6, f"recall@5 dropped to $recall%.2f")
  }

  test("s6: ten queries, contiguous ranks 1..k, no self-matches, deterministic") {
    val rows = ProductQuant.ivfPqTopK(t).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"query $q ranks must be contiguous from 1")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q), s"query $q self-match")
    }
    val again = ProductQuant.ivfPqTopK(t).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "the integer train/route/encode/score chain must be bit-deterministic")
  }

  test("s6 candidates all come from probed coarse cells (the pruning is real)") {
    import org.apache.spark.sql.functions.col
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kmeansCentroids(emb, 16)
    val cidOf = Similarity.assignNearest(emb, coarse).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"))).toMap
    // probe sets replayed the operator's way: queries rank centroids
    val probes = Similarity.ivfProbesForSpec(t, coarse, nQueries = 10, nprobe = 4)
    ProductQuant.ivfPqTopK(t).collect().foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(probes(q).contains(cidOf(n)),
        s"neighbor $n of query $q sits in unprobed cell ${cidOf(n)} — IVF pruning is broken")
    }
  }

  test("s6 recall@5 vs exact brute force stays reasonable under double pruning") {
    // IVF admits nprobe/nlist of the corpus, PQ ranks within it; with a
    // 64-candidate exact rerank the composition should still find most
    // true neighbors. Bound below observed (deterministic, so stable).
    val brute = Similarity.bruteForce(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfpq = ProductQuant.ivfPqTopK(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    assert(recall >= 0.5, f"s6 recall@5 dropped to $recall%.2f")
  }
}
