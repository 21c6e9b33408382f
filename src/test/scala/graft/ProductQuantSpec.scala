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

  test("s12: residual IVF-PQ — structure, determinism, gate-corpus recall never below the raw path") {
    val rows = ProductQuant.ivfPqResidualTopK(t).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q), s"query $q self-match")
    }
    val again = ProductQuant.ivfPqResidualTopK(t).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "the residual train/encode/score chain must be bit-deterministic")

    val brute = Similarity.bruteForce(t).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(rs: Array[org.apache.spark.sql.Row]) =
      (brute & rs.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet)
        .size.toDouble / brute.size
    val rRaw = recallOf(ProductQuant.ivfPqTopK(t).collect())
    val rRes = recallOf(rows)
    info(f"recall@5 raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes >= rRaw,
      f"residual encoding must not lose recall vs the raw path: $rRes%.3f < $rRaw%.3f")
    assert(rRes >= 0.5, f"s12 recall@5 dropped to $rRes%.3f")
  }

  test("s12 residual precision wins STRICTLY on a clustered corpus (the regime residual PQ exists for)") {
    import org.apache.spark.sql.functions.{array, col, lit}
    // 16 well-separated cluster centers, 32 members each, small
    // deterministic per-member offsets: raw PQ must spend its 16 codes
    // per subspace covering the BETWEEN-cluster spread, so within-cell
    // candidates collapse onto few codes and the ADC ranking is nearly
    // blind; residual codes see only the within-cell offsets and rank
    // them finely. Built as a Tables dir (embeddings.parquet only).
    val dir = java.nio.file.Files.createTempDirectory("s12clustered").toString
    def centerVal(c: Int, d: Int): Float =
      ((((c * 131071L + d * 40503L) % 1997).toFloat / 1997f) - 0.5f) * 2.0f
    def noiseVal(v: Int, d: Int): Float =
      ((((v * 2654435761L + d * 97L) % 997).toFloat / 997f) - 0.5f) * 0.05f
    val rows = (0 until 512).map { v =>
      val c = v % 16
      (v.toLong, (0 until 64).map(d => centerVal(c, d) + noiseVal(v, d)))
    }
    import spark.implicits._
    rows.toDF("vec_id", "emb")
      .select(col("vec_id"),
        col("emb").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val tc = Tables(spark, dir)
    val brute = Similarity.bruteForce(tc).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallOf(rs: Array[org.apache.spark.sql.Row]) =
      (brute & rs.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet)
        .size.toDouble / brute.size
    // nCandidates tighter than the 32-member clusters: the exact rerank
    // can no longer paper over a blind ADC ranking — which 8 candidates
    // get reranked IS the approximation quality under test
    val rRaw = recallOf(ProductQuant.ivfPqTopK(tc, nCandidates = 8).collect())
    val rRes = recallOf(ProductQuant.ivfPqResidualTopK(tc, nCandidates = 8).collect())
    info(f"clustered recall@5 raw=$rRaw%.3f residual=$rRes%.3f (nCandidates=8)")
    assert(rRes > rRaw,
      f"on the clustered corpus the residual path must STRICTLY beat raw: $rRes%.3f <= $rRaw%.3f")

    // the REFINE stage (refineFactor=4 → exact-cosine pool of 4·k=20):
    // the ADC's within-cell noise no longer decides the final ranking,
    // only the pruning — recall must rise strictly above the tight
    // shortlist and approach the pool's ceiling
    val rRef = recallOf(
      ProductQuant.ivfPqResidualTopK(tc, nCandidates = 8, refineFactor = 4).collect())
    info(f"clustered recall@5 refined=$rRef%.3f (pool 4·k)")
    assert(rRef > rRes,
      f"the refine pool must strictly beat the tight shortlist: $rRef%.3f <= $rRes%.3f")
    assert(rRef >= 0.6, f"refined recall@5 dropped to $rRef%.3f")
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
