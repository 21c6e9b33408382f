package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

class CurationSpec extends SparkSpecBase {
  private lazy val t = Tables(spark, sfDir)

  test("dc1 decontamination flags near-dups of benchmark docs, never benchmark docs themselves") {
    val flagged = Curation.decontaminate(t).collect()
    assert(flagged.nonEmpty, "the corpus plants near-duplicates, some must overlap the benchmark slice")
    assert(flagged.forall(_.getAs[Long]("doc_id") >= 50), "benchmark docs are not corpus rows")
    assert(flagged.forall(_.getAs[Long]("n_shared") >= 5))
    // a literal copy of a benchmark doc must be caught
    val bench0 = t.documents.filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val planted = t.documents.filter(col("doc_id") >= 50 && col("text") === bench0)
      .select("doc_id").collect().map(_.getLong(0))
    planted.foreach { id =>
      assert(flagged.exists(_.getAs[Long]("doc_id") == id), s"exact benchmark copy $id must be flagged")
    }
  }

  test("dc3 canonical selection keeps exactly one highest-quality doc per cluster") {
    val clusters = graft.operators.Dedup.clusters(t).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    val quality = graft.operators.TextAnalysis.quality(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val keepers = Curation.canonicalPerCluster(t).collect()
    assert(keepers.length == clusters.size, "one keeper per cluster")
    keepers.foreach { k =>
      val cid = k.getAs[Long]("cluster_id")
      val members = clusters(cid)
      val keeper = k.getAs[Long]("keeper_id")
      assert(members.contains(keeper))
      val best = members.map(quality).max
      assert(quality(keeper) == best, "keeper has the cluster's best quality")
      assert(keeper == members.filter(quality(_) == best).min, "ties break to lowest id")
      assert(k.getAs[Long]("n_docs") == members.size)
    }
  }

  test("dc2 budget sampling is deterministic and respects the per-source token budget") {
    val a = Curation.sampleToBudget(t).collect()
    val b = Curation.sampleToBudget(t).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "no rand(): rerun must match exactly")
    val bySource = a.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { rows =>
      val maxCum = rows.map(_.getAs[Long]("cum_tokens")).max
      assert(maxCum <= 10000, "budget respected")
      // cum_tokens is consistent with the selected docs' own counts
      assert(rows.map(_.getAs[Long]("ws_tokens")).sum == maxCum)
    }
    // a smaller budget selects a prefix of the same priority order
    val small = Curation.sampleToBudget(t, budgetTokens = 3000)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val large = a.map(_.getAs[Long]("doc_id")).toSet
    assert(small.subsetOf(large), "shrinking the budget only removes docs, never swaps them")
  }
}
