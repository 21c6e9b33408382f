package graft

/** A whole-inventory scale audit: every `SparkEntry.queries` plan is
  * built (planning only — nothing executes) and scanned for the two
  * operators that are scale killers at 100 TB regardless of tuning. The
  * per-query shape locks live in PlanShapeSpec; this spec is the
  * backstop that a NEW query (or a Catalyst planning change) cannot
  * introduce an O(n·m) join without a test turning red.
  */
class PlanAuditSpec extends SparkSpecBase {

  /** Queries whose BroadcastNestedLoopJoin is the intended pattern — in
    * every case a crossJoin against a BROADCAST side that is one row or
    * dimension-tiny by construction (the scalar-attach idiom), or s1's
    * by-design brute-force baseline:
    *  - dc4/dc9/dc10: total-mixture-weight one-row aggregate attach
    *  - t6: corpus doc-count attach (idf); t8/t12: total-token-count
    *    attach (t12 twice: bigram terms + first-token terms)
    *  - s2/s6: queries × nlist(=16) centroid table (s6's coarse router)
    *  - s1: queries × corpus brute force — the declared correctness
    *    baseline whose scale paths are s2/s3
    */
  private val scalarAttachBnlj = Set(
    "dc4_mixture", "dc9_full_curation", "dc10_curation_audit",
    "t6_tfidf", "t8_unigram_logprob", "t12_bigram_logprob",
    "s2_ann_ivf", "s6_ann_ivfpq", "s1_ann_brute",
    // s12: s6's probe crossJoin plus the (nQueries × nlist) coarse-dot
    // scalar table — both sides broadcast-tiny by construction (queries
    // and centroids), never corpus rows
    "s12_ann_ivfpq_residual",
    // t15: the 1-row CMS sketch attaches to the 10 probe tokens;
    // t16: the 1-row token and bigram totals attach to the pair table
    "t15_cms_freq", "t16_pmi_collocations",
    // q30: the pairwise type_a < type_b self-join of the per-event-type
    // sketch table — group-count-sized both sides (5 rows), never data
    "q30_kmv_overlap",
    // t17: the 1-row (N, avgdl) corpus-stats aggregate attaches to the
    // per-(doc, term) hit rows (s7's legs hide the same attach behind
    // globalRowNumber's checkpoint)
    "t17_bm25",
    // t22: the same 1-row (n_docs, avgdl) attach, read from the
    // persisted index's stats table instead of recomputed
    "t22_bm25_store_probe",
    // t23: t22's attach with the stats MERGED across base + segments —
    // the union aggregates to one row before the crossJoin
    "t23_bm25_append_probe",
    // dc14: inherits t12's 1-row corpus-total attach (the gate itself
    // adds only a co-keyed join + counters)
    "dc14_perplexity_gate",
    // t19: the 1-row corpus-token total attaches to the vocabulary-sized
    // (source, token) frame
    "t19_kl_drift",
    // s8: s1's query-set crossJoin — the 10-row query side broadcasts,
    // the corpus streams through the cosine kernel
    "s8_range_search",
    // dc16: dc4's 1-row total-weight attach to the enum-sized language
    // budget table
    "dc16_language_balance",
    // s9: s2's query-by-centroid crossJoin (nlist-row broadcast)
    "s9_ivf_range",
    // g10: three ONE-ROW aggregates (sampled-triangle count, edge
    // count, sampled-edge count) crossJoin into the single result row
    "g10_triangle_sample")

  test("no query plan contains a CartesianProduct; BNLJ only where declared scalar-attach") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !scalarAttachBnlj(name))
        Seq(s"$name: undeclared BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty,
      s"scale-killer join shapes found (declare in scalarAttachBnlj ONLY if the " +
        s"broadcast side is provably one-row/tiny):\n${offenders.mkString("\n")}")
  }

  test("every declared scalar-attach BNLJ still exists (the allowlist cannot go stale)") {
    val stale = scalarAttachBnlj.filter { name =>
      !SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"allowlisted queries no longer plan a BNLJ — prune: $stale")
  }
}
