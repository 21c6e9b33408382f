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

  test("dc4 mixture sampling honors weighted per-source budgets and priority order") {
    val rows = Curation.sampleToMixture(t, totalBudget = 20000).collect()
    assert(rows.nonEmpty)
    // per-source budget = floor(total * w / sum(w)) with w = srcN % 3 + 1
    val weights = (0 until 20).map(i => s"src$i" -> (i % 3 + 1).toDouble).toMap
    val sumW = weights.values.sum
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, srcRows) =>
      val expectedBudget = math.floor(20000.0 * weights(src) / sumW).toLong
      assert(srcRows.forall(_.getAs[Long]("src_budget") == expectedBudget), s"$src budget")
      assert(srcRows.map(_.getAs[Long]("cum_tokens")).max <= expectedBudget)
    }
    // heavier-weighted sources get proportionally larger budgets
    val bySrc = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.head.getAs[Long]("src_budget")).toMap
    assert(bySrc("src2") > bySrc("src0"), "w=3 source outbudgets w=1 source")
    // deterministic rerun
    val again = Curation.sampleToMixture(t, totalBudget = 20000).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("dc4 fails loudly on NULL or non-positive weights instead of silently dropping sources") {
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

    // a weight evaluating to NULL used to yield a NULL budget, and the
    // cum_tokens <= src_budget filter then deleted the whole source from
    // the mixture with no error anywhere
    val nullW = when(col("source") === "src1", lit(null).cast("int")).otherwise(lit(1))
    val e1 = intercept[Exception] {
      Curation.sampleToMixture(t, totalBudget = 20000, weight = nullW).collect()
    }
    assert(chain(e1).contains("src1") && chain(e1).contains("positive"), chain(e1))

    val zeroW = when(col("source") === "src2", lit(0)).otherwise(lit(2))
    val e2 = intercept[Exception] {
      Curation.sampleToMixture(t, totalBudget = 20000, weight = zeroW).collect()
    }
    assert(chain(e2).contains("src2"), chain(e2))

    // the default weight's try_cast reaches the same named-source error
    // for a source name it cannot parse (instead of an opaque ANSI cast
    // failure deep in the plan)
    val renamed = t.documents.withColumn("source",
      when(col("doc_id") === 7, lit("webcrawl")).otherwise(col("source")))
    val dir = java.nio.file.Files.createTempDirectory("graft_dc4w_").toString
    renamed.write.parquet(s"$dir/documents.parquet")
    val e3 = intercept[Exception] {
      Curation.sampleToMixture(graft.sources.Tables(spark, dir), totalBudget = 20000).collect()
    }
    assert(chain(e3).contains("webcrawl"), chain(e3))

    // a uniform custom weight keeps every source (no silent drops)
    val uniform = Curation.sampleToMixture(t, totalBudget = 20000, weight = lit(1)).collect()
    assert(uniform.map(_.getAs[String]("source")).distinct.length ==
      t.documents.select("source").distinct().count())
  }

  test("dc5 Bloom-prefiltered decontamination equals dc1 exactly") {
    val dc1 = Curation.decontaminate(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"))).sorted
    val dc5 = Curation.decontaminateBloom(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"))).sorted
    assert(dc5.nonEmpty && dc5.sameElements(dc1),
      "no false negatives + exact verify => identical result sets")
    // a deliberately tiny filter (high FP rate) must STILL equal dc1 —
    // false positives only add prefilter survivors, never results
    val tiny = Curation.decontaminateBloom(t, nbits = 256, kProbes = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"))).sorted
    assert(tiny.sameElements(dc1), "saturated filter degrades to dc1's plan, not dc1's answer")
  }

  test("dc12 near-dup decontamination = best-match-per-doc of the one-sided LSH at the bench split") {
    val dc12 = Curation.neardupDecontaminate(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_bench"),
        r.getAs[Double]("est_jaccard")))
    assert(dc12.nonEmpty, "the corpus plants near-duplicates across the benchmark split")
    assert(dc12.forall(_._1 >= 50) && dc12.forall(_._2 < 50),
      "contaminated docs are corpus rows; matches are benchmark rows")
    assert(dc12.map(_._1).distinct.length == dc12.length, "one best match per contaminated doc")
    // same kernel, same split: d7's one-sided incremental pairs at
    // (splitId = benchSize, threshold) reduced to the per-doc best
    // (highest est, lowest bench id) must be exactly dc12
    val pairs = graft.operators.Dedup.minhashIncremental(t, splitId = 50, threshold = 0.35)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("est_jaccard")))
    val best = pairs.groupBy(_._1).map { case (_, ps) =>
      ps.minBy(p => (-p._3, p._2))
    }.toSeq.sortBy(_._1)
    assert(dc12.toSeq.sortBy(_._1) == best,
      "dc12 is d7's probe with the roles flipped — the results must agree pair for pair")
  }

  test("dc13 panel counts equal each granularity's own operator; an exact copy trips all four") {
    val panel = Curation.contaminationPanel(t).collect()
      .map(r => r.getAs[String]("granularity") -> r.getAs[Long]("n_contaminated")).toMap
    assert(panel.keySet == Set("exact", "ngram", "neardup", "substring"))
    assert(panel("ngram") == Curation.decontaminate(t).count())
    assert(panel("neardup") == Curation.neardupDecontaminate(t).count())
    assert(panel("substring") ==
      graft.operators.Dedup.substringSpansIncremental(t, splitId = 50)
        .select("new_id").distinct().count())
    // crafted corpus: doc 100 is an exact copy of bench doc 0 — every
    // granularity must catch it (plus padding docs so shingle df stays low)
    val benchText = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4).trim
    val rows = Seq(0L -> benchText) ++
      (1L until 50L).map(i => i -> s"bench item $i unique ${"word" + i} content row") ++
      Seq(100L -> benchText) ++
      (101L until 120L).map(i => i -> s"corpus filler $i with its own ${"tok" + i} text body")
    val crafted = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_dc13_")
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.sources.Tables(spark, dir.toString)
    }
    val p2 = Curation.contaminationPanel(crafted).collect()
      .map(r => r.getAs[String]("granularity") -> r.getAs[Long]("n_contaminated")).toMap
    assert(p2.forall(_._2 >= 1L),
      s"an exact benchmark copy must trip every granularity: $p2")
  }

  test("dc7 contamination report matches brute-force pairwise overlap exactly") {
    val docs = t.documents.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shingles(s: String): Set[String] = {
      val toks = s.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < 3) Set.empty else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val bench = docs.collect { case (id, tx) if id < 50 => id -> shingles(tx) }
    val corpus = docs.collect { case (id, tx) if id >= 50 => id -> shingles(tx) }
    val pairs = for {
      (b, bs) <- bench.toSeq; (c, cs) <- corpus.toSeq
      n = (bs & cs).size if n >= 5
    } yield (b, c, n.toLong)
    val expected = pairs.groupBy(_._1).map { case (b, ps) =>
      val maxShared = ps.map(_._3).max
      // worst offender: max shared, ties to lowest corpus id
      val worst = ps.filter(_._3 == maxShared).map(_._2).min
      b -> (ps.size.toLong, maxShared, worst)
    }
    assert(expected.nonEmpty, "the corpus plants contamination; the report must be non-empty")

    val out = Curation.contaminationReport(t).collect()
      .map(r => r.getAs[Long]("bench_id") ->
        (r.getAs[Long]("n_contaminating"), r.getAs[Long]("max_shared"),
          r.getAs[Long]("worst_doc_id"))).toMap
    assert(out == expected,
      s"report must equal pairwise ground truth\nexpected $expected\ngot $out")
  }

  test("dc6 quality gate drops for the right named reasons and agrees with t2/t7 metrics") {
    import spark.implicits._
    // planted docs, one per rule (and one clean), so every reason fires
    val clean = ("the quick brown fox jumps over the lazy dog and then runs far away " +
      "to find a place in the sun with many other animals on a warm day for rest").trim
    val docs = Seq(
      (1L, clean), // keeps: long enough, stopwords, varied
      (2L, "just five words right here"), // too_short (also low_stopword)
      (3L, clean + " !!!...;;;,,,???!!!...;;;,,,???"), // high_punct
      (4L, (1 to 40).map(i => s"w$i").mkString(" ")), // low_stopword
      (5L, "the " * 39 + "end"), // repetitive_tokens + dominant_token + repetitive_2grams
      (6L, (1 to 20).flatMap(_ => Seq("the", "of")).mkString(" ") + " tail") // repetitive_2grams
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dc6_").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val pt = graft.sources.Tables(spark, dir)
    val out = Curation.qualityGate(pt).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("reasons"))).toMap
    assert(out(1L) == (true, ""), s"clean doc must keep: ${out(1L)}")
    assert(!out(2L)._1 && out(2L)._2.contains("too_short"))
    assert(!out(3L)._1 && out(3L)._2.contains("high_punct"))
    assert(!out(4L)._1 && out(4L)._2 == "low_stopword")
    assert(!out(5L)._1 && out(5L)._2.contains("repetitive_tokens")
      && out(5L)._2.contains("dominant_token"))
    assert(!out(6L)._1 && out(6L)._2.contains("repetitive_2grams"))

    // reasons come in fixed rule order (stable output for the oracle)
    assert(out(5L)._2.indexOf("repetitive_tokens") < out(5L)._2.indexOf("dominant_token"))

    // on the real corpus both outcomes occur, and quality_score equals t2's
    val gate = Curation.qualityGate(t).collect()
    assert(gate.exists(_.getAs[Boolean]("keep")) && gate.exists(!_.getAs[Boolean]("keep")),
      "thresholds must exercise both outcomes on testdata")
    val t2score = graft.operators.TextAnalysis.quality(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    gate.foreach(r => assert(r.getAs[Double]("quality_score") ==
      t2score(r.getAs[Long]("doc_id")), "gate and t2 share one formula"))
  }

  test("dc8 semantic canonical matches a driver-side union-find over the embedding pair graph") {
    val pairs = graft.operators.Dedup.embeddingPairs(t, 0.3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    // union-find ground truth for the component structure
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
    val membership = parent.keys.map(v => v -> find(v)).toSeq
      .groupBy { case (_, root) => root }
      .map { case (_, vs) => val ids = vs.map(_._1).toSet; ids.min -> ids }
    val quality = graft.operators.TextAnalysis.quality(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val expected = membership.map { case (label, ids) =>
      val keeper = ids.toSeq.sortBy(id => (-quality(id), id)).head
      label -> ((keeper, quality(keeper), ids.size.toLong))
    }
    val got = graft.operators.Curation.semanticCanonical(t).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("keeper_id"), r.getAs[Double]("keeper_score"),
          r.getAs[Long]("n_docs")))).toMap
    assert(got == expected, s"semantic keepers diverge: got $got want $expected")
    assert(got.size > 1, "threshold 0.3 yields a non-degenerate cluster structure")
  }

  test("dc10 attrition audit: stages are monotone in rows AND tokens, consistent with the run it audits") {
    val audit = Curation.fullCurationAudit(t).collect()
    val chain = Seq("corpus", "quality_gate", "exact_dedup", "near_dup",
      "substring_rewrite", "decontaminate", "mixture")
    assert(audit.map(_.getAs[String]("stage")).toSeq == chain,
      "seven stages in pipeline order")
    val counts = audit.map(r => r.getAs[String]("stage") -> r.getAs[Long]("survivors")).toMap
    val tokens = audit.map(r => r.getAs[String]("stage") -> r.getAs[Long]("ws_tokens")).toMap
    // each stage only ever drops rows and tokens (a stage may drop
    // nothing at this tiny sf — the sf0.01 oracle pins exact values;
    // the rewrite stage drops TOKENS, never rows)
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(counts(b) <= counts(a), s"stage $b cannot add rows over $a: $counts")
      assert(tokens(b) <= tokens(a), s"stage $b cannot add tokens over $a: $tokens")
    }
    assert(counts("substring_rewrite") == counts("near_dup"),
      "the rewrite stage cuts spans, never documents")
    assert(counts("mixture") < counts("corpus"),
      s"the pipeline must drop SOMETHING on this corpus: $counts")
    // the audited counts are the run's own: the final stage equals dc9's output
    assert(counts("mixture") == Curation.fullCuration(t).count(),
      "audit's mixture row must equal the shipped dc9 row count")
    assert(counts("corpus") ==
      t.documents.filter(col("doc_id") >= 50).count(), "input census matches the corpus slice")
  }

  test("dc9 composes the substring rewrite: spans cut before decon sees shingles, tokens budgeted after the cut, fixed point holds") {
    import spark.implicits._
    // PLANTED corpus: the sf corpora's span carriers die in earlier
    // stages, so the composed rewrite needs its own crafted input.
    //   span = "the zz01 … zz19" (20 tokens, FNV 8-shingle islands →
    //   one 20-token cut; contains the bench-overlapping subrun)
    val span = ("the" +: (1 to 19).map(i => f"zz$i%02d")).mkString(" ")
    def fillers(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    def doc(id: Long, text: String, source: String) =
      (id, text, "en", source, text.length.toLong)
    val rows = Seq(
      // bench doc: shares 6 ≥ minShared 3-shingles with the span's
      // zz05..zz12 subrun (bench docs are ungated)
      doc(10L, (5 to 12).map(i => f"zz$i%02d").mkString(" "), "src1"),
      // the span KEEPER (lowest doc_id): stays contaminated → decon drops it
      doc(55L, s"the a ${fillers("ka", 18)} $span ${fillers("kb", 20)}", "src1"),
      // the span LOSER: the rewrite cuts its copy, and with it the ONLY
      // shingles it shares with the bench → survives decon — the
      // order-of-stages semantics (decon judges the text that ships)
      doc(70L, s"the a ${fillers("la", 18)} $span ${fillers("lb", 20)}", "src2"),
      // plain survivors + an exact-dup pair + a near-dup pair
      doc(71L, s"the a ${fillers("pa", 30)}", "src1"),
      doc(72L, s"the a ${fillers("pb", 30)}", "src2"),
      doc(80L, s"the a ${fillers("pa", 30)}", "src1"), // exact dup of 71
      doc(81L, s"the a ${fillers("nd", 30)} x1 x2", "src1"),
      doc(82L, s"the a ${fillers("nd", 30)} y1 y2", "src2")) // near-dup of 81
    val dir = java.nio.file.Files.createTempDirectory("graft_dc9_planted_").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pt = graft.sources.Tables(spark, dir)

    val audit = Curation.fullCurationAudit(pt).collect()
    val tokens = audit.map(r => r.getAs[String]("stage") -> r.getAs[Long]("ws_tokens")).toMap
    val counts = audit.map(r => r.getAs[String]("stage") -> r.getAs[Long]("survivors")).toMap
    assert(counts("exact_dedup") == counts("quality_gate") - 1, "doc 80 exact-dups doc 71")
    assert(counts("near_dup") == counts("exact_dedup") - 1, "one of 81/82 is a near-dup drop")
    assert(tokens("substring_rewrite") == tokens("near_dup") - 20,
      s"doc 70's 20-token span copy is cut, doc 55's kept: $tokens")

    val out = Curation.fullCuration(pt).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(55L), "the span keeper stays contaminated and decon drops it")
    assert(ids.contains(70L), "the rewritten doc LOST its contaminating shingles and survives")
    val d70 = out.find(_.getAs[Long]("doc_id") == 70L).get
    assert(d70.getAs[Long]("ws_tokens") == 40L,
      "doc 70's budgeted tokens are the REWRITTEN count: 60 original - the 20-token cut")

    // fixed point over the composition's OUTPUT corpus: re-running d9 on
    // the rewritten survivor text finds zero cross-doc spans
    assert(graft.operators.Dedup.substringSpansOfDocs(
      Curation.fullCurationRewritten(pt)).isEmpty,
      "the text dc9 hands to mixture/packing carries no duplicated span")
  }

  test("t7 repetition scoring: planted duplicate tokens raise the dup fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all distinct
      (2L, "spam spam spam spam spam spam"), // one token repeated
      (3L, "a b a b a b a b") // repeated 2-gram pattern
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextAnalysis.repetition(graft.sources.Tables(spark, dir)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_token_frac") == 0.0)
    assert(out(1L).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(out(2L).getAs[Double]("top_token_frac") == 1.0)
    assert(out(2L).getAs[Double]("dup_2gram_frac") > 0.7, "spam^6 has 5 identical 2-grams")
    assert(out(3L).getAs[Double]("dup_token_frac") == 0.75, "8 tokens, 2 distinct")
    assert(out(3L).getAs[Double]("dup_2gram_frac") > 0.5, "ababab alternates 2 shingles")
  }

  test("dc15 stratified sample: two-level selection equals the single window, k per stratum, partition-invariant") {
    val out = Curation.stratifiedSample(t, k = 10).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rn"), r.getAs[Long]("doc_id")))
    // exactly k per stratum (every test stratum has ≥ k docs), ranks gapless
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length), s"$lang ranks gapless")
      assert(rows.length <= 10)
    }
    // selection-equivalent to the plain single-window rule: k smallest
    // md5 keys per stratum, recomputed driver-side
    val all = t.documents.select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = all.groupBy(_._1).flatMap { case (lang, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(10).zipWithIndex
        .map { case (r, i) => (lang, i + 1, r._2) }.toSeq
    }.toSet
    assert(out.toSet == expected, "two-level ≡ single-window selection")
    // and invariant to input partitioning (spark_partition_id appears
    // only in the local prune, never in the selection rule) — ACTUALLY
    // vary the partitioning, don't re-run the identical plan
    Seq(1, 7).foreach { p =>
      val repart = Curation.stratifiedSampleOf(t.documents.repartition(p), k = 10)
        .collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rn"), r.getAs[Long]("doc_id")))
      assert(repart.toSet == out.toSet, s"selection invariant at $p partitions")
    }
  }

  test("dc14 perplexity gate reconciles per-source counters against the raw t12 scores") {
    val thr = -3.41
    val scores = graft.operators.TextAnalysis.bigramLogprob(t)
      .join(t.documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("avg_logprob")))
    val out = Curation.perplexityGate(t, thr).collect()
    assert(out.nonEmpty)
    val totalKept = out.map(_.getAs[Long]("n_kept")).sum
    assert(totalKept > 0 && totalKept < scores.length, "the threshold actually splits the corpus")
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = scores.filter(_._1 == src).map(_._2)
      assert(r.getAs[Long]("n_docs") == mine.length)
      val kept = mine.filter(_ >= thr)
      assert(r.getAs[Long]("n_kept") == kept.length)
      assert(math.abs(r.getAs[Double]("kept_frac") - kept.length.toDouble / mine.length) < 1e-6)
      if (kept.nonEmpty) {
        // decimal-exact sum of the already-rounded scores, then one division
        val exp = BigDecimal(kept.map(BigDecimal(_)).sum.toDouble / kept.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("avg_kept_lp") - exp) < 2e-6, s"$src mean kept score")
      }
    }
  }

  test("dc17 source overlap reconciles with d2's pairs rolled up by source") {
    import graft.operators.Dedup
    val srcOf = t.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLsh(t).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val got = Curation.sourceOverlap(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, "the matrix must be exactly d2's pairs rolled up by source")
    assert(got.values.sum == pairs.length.toLong, "every pair is counted exactly once")
    assert(got.keys.forall { case (a, b) => a <= b }, "source pairs are order-normalized")
  }

  test("dc16 language balance: equal budgets, greedy md5 prefix per language, binding cut") {
    import graft.operators.TextAnalysis
    val rows = Curation.languageBalance(t).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("ws_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("lang_budget")))
    assert(rows.nonEmpty)
    // every predicted language present in the corpus gets the SAME budget
    val langs = TextAnalysis.langId(t).collect().map(_.getAs[String]("pred_lang")).distinct
    val budgets = rows.map(_._5).distinct
    assert(budgets.length == 1 && budgets.head == 12000L / langs.length,
      s"equal floor(budget/n_langs) share, got $budgets for ${langs.length} langs")
    // the cut binds: not every doc survives, and cums respect the budget
    assert(rows.length < t.documents.count())
    assert(rows.forall { case (_, _, _, cum, b) => cum <= b })
    // per language: selected docs are exactly the greedy md5-priority
    // prefix of that language's docs
    val byLang = TextAnalysis.langId(t).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang"))
    val toks = t.documents.select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val selected = rows.map(r => (r._1, r._2)).toSet
    byLang.groupBy(_._2).foreach { case (lang, docs) =>
      val budget = 12000L / langs.length
      var cum = 0L
      docs.map(_._1).sortBy(id => (md5(id.toString), id)).foreach { id =>
        cum += toks(id)
        assert(selected.contains((id, lang)) == (cum <= budget),
          s"doc $id in $lang: greedy prefix membership")
      }
    }
  }
}
