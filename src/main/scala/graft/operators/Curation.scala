package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Corpus-curation operators: the decisions a training-data pipeline
  * makes BETWEEN dedup and training — keeping benchmark data out of the
  * corpus and fitting sources into a token budget — expressed as plain
  * joins/aggregations so they hold at corpus scale.
  */
object Curation {

  /** dc1: benchmark decontamination. Flags corpus documents sharing at
    * least `minShared` distinct word-`k`-gram shingles with ANY benchmark
    * document (here: `doc_id < benchSize` stands in for the eval set,
    * like s1's query subset). The benchmark shingle vocabulary is tiny
    * next to the corpus, so the join is a broadcast: every corpus
    * shingle checks membership map-side and only (doc_id) hits shuffle
    * for the count — the shape that survives a 100 TB corpus against a
    * fixed eval suite. Shingles are FNV-hashed map-side (codegen), the
    * same collision-negligible domain d4 counts in.
    */
  /** Per-doc distinct shingle-hash arrays — shared by dc1 and dc5, so
    * the Bloom-prefiltered plan is STRUCTURALLY the same exact pipeline
    * (its equals-dc1 oracle contract cannot drift by a one-sided edit).
    */
  private def shingled(t: Tables, k: Int): DataFrame =
    t.documents
      .select(col("doc_id"), ws_tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), array_distinct(shingle_hashes(col("toks"), k)).as("shingles"))

  /** The exact overlap-count tail shared by dc1 and dc5: explode the
    * candidate docs' shingles, count matches against the (broadcast)
    * benchmark shingle set, keep docs with ≥ minShared.
    */
  private def sharedCounts(candidates: DataFrame, benchShingles: DataFrame,
      minShared: Long): DataFrame =
    candidates
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_id"))

  def decontaminate(t: Tables, benchSize: Long = 50, k: Int = 3, minShared: Long = 5): DataFrame = {
    val sh = shingled(t, k)
    val bench = sh.filter(col("doc_id") < benchSize)
      .select(explode(col("shingles")).as("shingle")).distinct()
    sharedCounts(sh.filter(col("doc_id") >= benchSize), bench, minShared)
  }

  /** dc5: Bloom-prefiltered decontamination — dc1's output through a
    * runtime-filter plan. The benchmark's shingle set is summarized into
    * a FIXED-SIZE Bloom filter (128 KiB at nbits=2^20 regardless of set
    * size — vs a broadcast hash of the full set); every corpus document
    * probes the filter map-side in one codegen pass and dies in the scan
    * if it cannot reach `minShared` hits. Only surviving docs explode
    * shingles into the exact join, which removes Bloom false positives —
    * so the result EQUALS dc1 (Bloom has no false negatives; the
    * prefilter only discards docs the exact join would discard anyway),
    * and the dc1 oracle verifies this plan end-to-end. At 100 TB the
    * exact-join stage processes only the prefilter's survivors instead
    * of every corpus shingle.
    */
  def decontaminateBloom(t: Tables, benchSize: Long = 50, k: Int = 3, minShared: Long = 5,
      nbits: Int = 1 << 20, kProbes: Int = 4): DataFrame = {
    val sh = shingled(t, k)
    val filterBytes: Array[Byte] = sh.filter(col("doc_id") < benchSize)
      .agg(bloom_build(col("shingles"), nbits, kProbes).as("f"))
      .collect()(0).getAs[Array[Byte]](0) // fixed 5 + nbits/8 bytes, driver-safe by construction
    val candidates = sh.filter(col("doc_id") >= benchSize)
      .filter(bloom_hits(col("shingles"), filterBytes.toSeq) >= minShared)
    val bench = sh.filter(col("doc_id") < benchSize)
      .select(explode(col("shingles")).as("shingle")).distinct()
    sharedCounts(candidates, bench, minShared)
  }

  /** dc12: NEAR-DUP decontamination — dc1/dc5 catch verbatim shingle
    * overlap; this catches paraphrase/near-verbatim contamination (the
    * kind a light rewrite of an eval item survives) with d2's MinHash
    * kernel: a corpus document whose estimated Jaccard against ANY
    * benchmark document reaches `threshold` is contaminated. The output
    * is the removal audit — each contaminated doc with its best-matching
    * benchmark item (highest estimate, lowest bench id on ties), the
    * record an eval owner reviews before the anti-join drops the doc.
    *
    * Scale shape is d7's ONE-SIDED LSH probe with the roles flipped:
    * corpus band keys join ONLY the benchmark's band keys — and the
    * benchmark side is an eval suite, tiny by construction, so its
    * (band_idx, band_hash, bench_id) table BROADCASTS and corpus bands
    * are checked map-side. The corpus never self-pairs, history×history
    * work never forms, and only (corpus_id, bench_id) hits reach the
    * verify join. Signatures are checkpointed once (n×64 longs) and
    * re-attached to the tiny surviving pair set, d2's contract.
    */
  def neardupDecontaminate(t: Tables, benchSize: Long = 50, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.35): DataFrame = {
    val sigs = t.documents
      .select(col("doc_id"), ws_tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 1)
      .select(col("doc_id"), shingle_minhash(col("toks"), 2, numHashes, 42L).as("sig"))
      .localCheckpoint(true)
    val banded = sigs.select(col("doc_id"), posexplode(sig_bands(col("sig"), bands)))
      .select(col("doc_id"), col("pos").as("band_idx"), col("col").as("band_hash"))
    val benchBands = banded.filter(col("doc_id") < benchSize)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("bench_id"))
    val hits = banded.filter(col("doc_id") >= benchSize)
      .join(broadcast(benchBands), Seq("band_idx", "band_hash"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
    val verified = hits
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")), Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("bench_id"), col("sig").as("sig_b")), Seq("bench_id"))
      .withColumn("est_jaccard",
        sig_agreement(col("sig_a"), col("sig_b")).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
    // pair set is contamination-sized; the per-doc best-match window is
    // keyed on doc_id, never a global single partition
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("est_jaccard").desc, col("bench_id"))
    verified
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bench_id").as("matched_bench"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** dc13: the CONTAMINATION PANEL — one benchmark-overlap report
    * across every granularity the engine detects, in severity order of
    * what each one catches: EXACT copies (md5), NGRAM overlap (dc1's
    * ≥ minShared distinct shingles), NEARDUP paraphrase (dc12's MinHash
    * estimate ≥ threshold), and SUBSTRING verbatim spans (d10's
    * one-sided positional index, ≥ minSpanTokens tokens). One row per
    * granularity with its contaminated-corpus-doc count — the weekly
    * eval-hygiene summary a lab reviews before any removal runs, and
    * the composition proof that the four detectors agree on their
    * domains (an exact copy necessarily trips all four).
    *
    * Scale shape is inherited: each branch is the corresponding
    * operator's plan (broadcast bench shingles / broadcast bench bands /
    * one-sided positional probe) reduced to a single count — compact
    * scalar exchanges only, composed as a 4-row union.
    */
  def contaminationPanel(t: Tables, benchSize: Long = 50, k: Int = 3,
      minShared: Long = 5, neardupThreshold: Double = 0.35,
      minSpanTokens: Int = 16): DataFrame = {
    val docs = t.documents
    val benchHashes = docs.filter(col("doc_id") < benchSize)
      .select(md5(col("text")).as("h")).distinct()
    val exact = docs.filter(col("doc_id") >= benchSize)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(broadcast(benchHashes), Seq("h"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated"))
      .select(lit("exact").as("granularity"), col("n_contaminated"))
    val ngram = decontaminate(t, benchSize, k, minShared)
      .agg(count(lit(1)).as("n_contaminated"))
      .select(lit("ngram").as("granularity"), col("n_contaminated"))
    val neardup = neardupDecontaminate(t, benchSize, threshold = neardupThreshold)
      .agg(count(lit(1)).as("n_contaminated"))
      .select(lit("neardup").as("granularity"), col("n_contaminated"))
    val substring = Dedup.substringSpansIncremental(t, splitId = benchSize,
        minSpanTokens = minSpanTokens)
      .agg(countDistinct(col("new_id")).as("n_contaminated"))
      .select(lit("substring").as("granularity"), col("n_contaminated"))
    exact.unionAll(ngram).unionAll(neardup).unionAll(substring)
      .orderBy(col("granularity"))
  }

  /** dc7: contamination audit — the benchmark-side view of dc1. dc1
    * answers "which corpus documents must die"; this answers "which eval
    * items are compromised, how many corpus documents hit each, and
    * which one is the worst offender" — the report a decontamination run
    * ships to the eval owners. Semantics are per-PAIR: a benchmark doc
    * appears when at least one single corpus document shares
    * ≥ `minShared` shingles with it specifically (dc1's count is against
    * the union of all benchmark shingles, so the two operators answer
    * different questions from the same join).
    *
    * Scale shape: the (shingle → bench_id) table is eval-suite-sized and
    * broadcast; corpus shingles probe it map-side and only matching
    * (bench, corpus) pairs shuffle for the count — the surviving pair
    * set is tiny at any corpus size (contamination is rare by
    * construction). Worst-offender ties break to the lowest corpus id.
    */
  def contaminationReport(t: Tables, benchSize: Long = 50, k: Int = 3,
      minShared: Long = 5): DataFrame = {
    val sh = shingled(t, k)
    val bench = sh.filter(col("doc_id") < benchSize)
      .select(col("doc_id").as("bench_id"), explode(col("shingles")).as("shingle"))
    val corpus = sh.filter(col("doc_id") >= benchSize)
      .select(col("doc_id").as("corpus_id"), explode(col("shingles")).as("shingle"))
    corpus
      .join(broadcast(bench), Seq("shingle"))
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .groupBy(col("bench_id"))
      .agg(
        count(lit(1)).as("n_contaminating"),
        max(col("shared")).as("max_shared"),
        max_by(col("corpus_id"), struct(col("shared"), (-col("corpus_id")).as("nid")))
          .as("worst_doc_id"))
      .orderBy(col("bench_id"))
  }

  /** dc3: canonical-document selection — the "keep one per cluster"
    * decision the dedup family exists for. Near-dup clusters (d6) joined
    * with quality scores (t2); each cluster keeps its highest-quality
    * member (tie → lowest doc_id) via `max_by` partial aggregation.
    * Composition of existing operators — the cluster table is tiny next
    * to the corpus, quality is a map-side pass, and the argmax shuffles
    * one row per member.
    */
  def canonicalPerCluster(t: Tables, oracleRounds: Option[Int] = None): DataFrame = {
    val clusters = Dedup.clusters(t, oracleRounds = oracleRounds)
    val quality = TextAnalysis.quality(t).select(col("doc_id"), col("quality_score"))
    clusters
      .join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("quality_score"), (-col("doc_id")).as("nid"))).as("keeper_id"),
        max(col("quality_score")).as("keeper_score"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("cluster_id"))
  }

  /** dc8: SEMANTIC canonical selection — dc3's keep-one-per-cluster
    * decision over EMBEDDING-space clusters instead of minhash clusters:
    * d5's cosine threshold pair graph (full set, no presentation limit)
    * → connected components (the d6 propagation, shared via
    * `clustersOfPairs`) → highest-quality keeper per cluster (tie →
    * lowest id). Complements d8: SemDeDup drops dominated members
    * within PRE-ASSIGNED k-means clusters; dc8 derives the groups from
    * pairwise similarity itself and picks the best-quality survivor —
    * the decision layer over near-duplicate MEANING rather than
    * near-duplicate TEXT. Embeddings map 1:1 to documents (vec_id ≡
    * doc_id in the testdata convention), so quality joins directly.
    *
    * Scale: the pair graph is band-bucketed (d5's shape), propagation
    * shuffles (id, label) rows, quality is one map-side pass, and the
    * argmax is one partial-agg shuffle of (cluster, id, score) rows.
    */
  def semanticCanonical(t: Tables, minCosine: Double = 0.3,
      oracleRounds: Option[Int] = None,
      nbits: Int = 0, bandBits: Int = 0): DataFrame = {
    // nbits/bandBits = d5's band-width scale lever (SCALECHECK). The
    // default (0, 0) derives the geometry from the corpus count
    // ([[graft.operators.scaleSafeLsh]]) so the pair graph stays linear
    // at any corpus size; pass both to pin a geometry explicitly
    val pairs = Dedup.embeddingPairs(t, minCosine, nbits, bandBits)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val clusters = Dedup.clustersOfPairs(pairs, oracleRounds = oracleRounds)
    val quality = TextAnalysis.quality(t).select(col("doc_id"), col("quality_score"))
    clusters
      .join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("quality_score"), (-col("doc_id")).as("nid"))).as("keeper_id"),
        max(col("quality_score")).as("keeper_score"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("cluster_id"))
  }

  /** dc4: domain-mixture sampling — dc2 generalized to WEIGHTED
    * per-source budgets, the "data mixing" step that fits heterogeneous
    * sources into a training-token budget at configured proportions.
    * `weight` is any deterministic per-source Column (a literal mixture
    * table joins in identically); each source's budget is
    * floor(totalBudget · w / Σw), then the same md5-priority running-sum
    * cut as dc2. The weight/budget table is one row per source —
    * broadcast — and the heavy text never shuffles: per-doc token counts
    * are computed map-side and only (doc_id, source, count) rows enter
    * the window.
    */
  def sampleToMixture(t: Tables, totalBudget: Long = 60000,
      weight: Column = expr("try_cast(substr(source, 4) as int)") % 3 + 1): DataFrame =
    mixtureOf(
      t.documents.select(col("doc_id"), col("source"),
        size(ws_tokens(col("text"))).cast("long").as("ws_tokens")),
      totalBudget, weight)

  /** dc16: LANGUAGE-balanced sampling — dc4's deterministic
    * budget-and-cut machinery stratified by t1's PREDICTED language
    * instead of the ingest source: every predicted language gets an
    * equal floor(budget/n_langs) token share, filled by the same
    * md5-priority greedy prefix. The multilingual-pretraining staple
    * (raw crawls are English-dominated; the training mixture is not) —
    * and the strata come from a MODEL of the data rather than its
    * provenance metadata, which is the usual production twist on dc4.
    *
    * Scale shape: dc4's exactly — language ID and token counts are one
    * map-side projection (shared rule, [[TextAnalysis.langSignals]]),
    * the per-language budget table is enum-sized and broadcast, and only
    * (doc_id, lang, count) rows enter the per-stratum window.
    */
  def languageBalance(t: Tables, totalBudget: Long = 12000): DataFrame =
    mixtureOf(
      TextAnalysis.langSignals(t)
        .select(col("doc_id"), col("pred_lang").as("source"),
          size(col("toks")).cast("long").as("ws_tokens")),
      totalBudget, lit(1.0))
      .withColumnRenamed("source", "pred_lang")
      .withColumnRenamed("src_budget", "lang_budget")

  /** dc17: cross-source OVERLAP matrix — d2's near-dup pairs rolled up
    * to (source_a, source_b, n_pairs): how much each ingest feed
    * duplicates each other feed (and itself, the diagonal). The
    * diagnostic that decides which scrape to drop when two feeds cover
    * the same sites — dedup tells you THAT documents repeat, this tells
    * you WHERE the repetition comes from. Source pairs are
    * order-normalized so (a, b) and (b, a) collapse.
    *
    * Scale shape: d2's band-bucket self-join does all the heavy work;
    * the source attach joins one enum-valued column onto the pair-sized
    * result, and the matrix aggregation shuffles (src, src) pairs — an
    * enum² grain.
    */
  def sourceOverlap(t: Tables, threshold: Double = 0.5): DataFrame = {
    val src = t.documents.select(col("doc_id"), col("source"))
    Dedup.minhashLsh(t, threshold = threshold)
      .select(col("doc_a"), col("doc_b"))
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), Seq("doc_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** dc4's core over an explicit `(doc_id, source, ws_tokens)` frame —
    * shared with the composed pipeline ([[fullCuration]]'s final stage).
    */
  private def mixtureOf(docs: DataFrame, totalBudget: Long, weight: Column): DataFrame = {
    // a NULL/non-positive weight would silently DELETE its whole source
    // from the mixture (NULL budget ⇒ the cum_tokens<=src_budget filter
    // keeps nothing) — fail loudly at the first evaluated row instead.
    // The default weight uses try_cast so an unexpected source name
    // reaches THIS check with a named source, not an opaque ANSI cast
    // error.
    val weights = docs.select(col("source")).distinct()
      .withColumn("w", weight.cast("double"))
      .withColumn("w",
        when(col("w").isNull || isnan(col("w")) || col("w") <= 0d,
          raise_error(concat(
            lit("dc4 mixture weight must be a positive number; source '"),
            col("source"), lit("' evaluated to "),
            coalesce(col("w").cast("string"), lit("NULL")))))
          .otherwise(col("w")))
    val totalW = weights.agg(sum(col("w")).as("tw"))
    val budgets = weights.crossJoin(broadcast(totalW))
      .withColumn("src_budget",
        floor(lit(totalBudget.toDouble) * col("w") / col("tw")).cast("long"))
      .select(col("source"), col("src_budget"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(budgets), Seq("source"))
      .withColumn("cum_tokens", sum(col("ws_tokens")).over(w))
      .filter(col("cum_tokens") <= col("src_budget"))
      .select(col("doc_id"), col("source"), col("ws_tokens"), col("cum_tokens"), col("src_budget"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** dc6: composite quality gate — the Gopher/C4-style keep/drop decision
    * every pretraining pipeline runs over every document, expressed as
    * named threshold rules over the t2 quality metrics and t7 repetition
    * fractions. Output is one row per document: `keep` plus the
    * comma-joined list of violated rules (in fixed rule order), so drops
    * are AUDITABLE — "what fraction died to which rule" is a groupBy away.
    *
    * Scale shape: one map-side projection over one documents scan
    * ([[TextAnalysis.gateMetrics]] — the metric formulas are shared with
    * t2/t7, not duplicated), no join, no shuffle except the final order.
    * Thresholds are calibrated to this corpus's measured distributions so
    * the gate exercises both outcomes; real pipelines tune them per
    * source.
    */
  def qualityGate(t: Tables,
      minTokens: Long = 16, maxPunct: Double = 0.10, minStop: Double = 0.01,
      maxDupToken: Double = 0.68, maxTopToken: Double = 0.16,
      maxDup2gram: Double = 0.08): DataFrame = {
    val rules = array(
      when(col("n_tokens") < minTokens, lit("too_short")),
      when(col("punct_ratio") > maxPunct, lit("high_punct")),
      when(col("stop_ratio") < minStop, lit("low_stopword")),
      when(col("dup_token_frac") > maxDupToken, lit("repetitive_tokens")),
      when(col("top_token_frac") > maxTopToken, lit("dominant_token")),
      when(col("dup_2gram_frac") > maxDup2gram, lit("repetitive_2grams")))
    TextAnalysis.gateMetrics(t)
      .withColumn("reasons_arr", array_compact(rules))
      .select(col("doc_id"),
        (size(col("reasons_arr")) === 0).as("keep"),
        array_join(col("reasons_arr"), ",").as("reasons"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** dc2: deterministic token-budget sampling. Each source keeps its
    * documents in md5(doc_id) priority order until the running
    * whitespace-token count exceeds `budgetTokens` — a reproducible
    * down-sample (no rand(): reruns, engines and audits agree on the
    * exact document set). One (source)-keyed window over precomputed
    * per-doc counts; the heavy text column never reaches the shuffle.
    */
  def sampleToBudget(t: Tables, budgetTokens: Long = 10000): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .select(col("doc_id"), col("source"),
        size(ws_tokens(col("text"))).cast("long").as("ws_tokens"))
      .withColumn("cum_tokens", sum(col("ws_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("source"), col("ws_tokens"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** dc9: the END-TO-END curation run — the workflow a real pipeline
    * executes as ONE job, composed from the verified stage operators in
    * their production order:
    *
    *   1. quality gate (dc6's rules) over the training corpus
    *      (`doc_id >= benchSize`; the eval slice is never trained on),
    *   2. exact dedup (d1's keep-min-id over md5(text)),
    *   3. near-dup clusters (d2's MinHash-LSH pairs → d6's propagation)
    *      with dc3's highest-quality-keeper decision,
    *   4. benchmark decontamination (dc1's ≥ minShared shared-shingle
    *      rule against the ungated eval slice),
    *   5. domain-mixture token budgeting (dc4's weighted md5-priority
    *      cut) over the survivors.
    *
    * Output is dc4's shape over the final survivor set: one row per
    * kept doc — (doc_id, source, ws_tokens, cum_tokens, src_budget).
    *
    * This row exists because stage-boundary bugs (column drift, rounding
    * at hand-offs, keeper-vs-drop ordering) only surface under
    * composition — each stage alone is oracle-verified, and this query's
    * oracle chains the same replicas end-to-end.
    *
    * Scale shape: ONE heavy scan computes every per-doc signal map-side
    * (gate metrics, content hash, MinHash signature, decon shingles,
    * token count) into a compact checkpointed base — the text column
    * never enters ANY exchange (PlanShapeSpec-asserted); every
    * subsequent stage shuffles only ids, hashes, signatures and counts.
    * The stages keep their individual 100 TB arguments: the exact-dedup
    * shuffle keys on (hash, id); band self-join on band keys; propagation
    * on (id, label); decon probes a broadcast eval shingle set; the
    * mixture windows (source)-keyed count rows.
    */
  def fullCuration(t: Tables, benchSize: Long = 50, shingleK: Int = 3,
      minShared: Long = 5, totalBudget: Long = 60000, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      weight: Column = expr("try_cast(substr(source, 4) as int)") % 3 + 1,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16,
      oracleRounds: Option[Int] = None): DataFrame =
    curationStages(t, benchSize, shingleK, minShared, totalBudget, numHashes,
      bands, threshold, weight, rewriteK, rewriteMinSpan,
      oracleRounds = oracleRounds).mixture

  /** The REWRITTEN survivor corpus dc9 hands to decon/mixture —
    * (doc_id, text) after the substring-rewrite stage — exposed so the
    * composition's fixed point is spec-assertable: re-running d9 over
    * THIS corpus finds zero cross-doc spans (the text a trainer
    * actually packs carries no duplicated span, end to end).
    */
  private[graft] def fullCurationRewritten(t: Tables, benchSize: Long = 50,
      oracleRounds: Option[Int] = None): DataFrame =
    curationStages(t, benchSize, 3, 5, 60000, 64, 16, 0.5,
      expr("try_cast(substr(source, 4) as int)") % 3 + 1, 8, 16,
      oracleRounds = oracleRounds).rewrittenText

  /** dc10: the attrition audit of [[fullCuration]] — per-stage survivor
    * counts (corpus → quality gate → exact dedup → near-dup → decon →
    * mixture), the summary a real curation run reports first (cf. the
    * reference's per-table record counts,
    * /root/reference/main.py:239-280 `_print_summary`). Built over the
    * SAME stage frames as the run it audits ([[curationStages]]), so the
    * audit cannot drift from the pipeline; its oracle chains the dc9
    * replica's stage CTEs' COUNT(*)s.
    *
    * Scale shape: each count is a full-pipeline aggregate, but every
    * stage past the gate reads the one checkpointed compact base (ids,
    * hashes, signatures — text never shuffles), and a COUNT over each is
    * a map-side partial + single-row exchange. The union of six
    * single-row aggregates is driver-trivial at any corpus size.
    */
  def fullCurationAudit(t: Tables, benchSize: Long = 50, shingleK: Int = 3,
      minShared: Long = 5, totalBudget: Long = 60000, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      weight: Column = expr("try_cast(substr(source, 4) as int)") % 3 + 1,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16,
      oracleRounds: Option[Int] = None): DataFrame = {
    // checkpointStages: without it the audit's count branches would
    // re-run the LSH-pair + propagation stage THREE times (Catalyst does
    // no common-subtree elimination across union branches) — with it,
    // each stage materializes once and every count reads a materialized
    // frame. dc9 itself keeps the checkpoint-free plan: its stages feed
    // exactly one consumer each, so a barrier would only add cost.
    val st = curationStages(t, benchSize, shingleK, minShared, totalBudget,
      numHashes, bands, threshold, weight, rewriteK, rewriteMinSpan,
      checkpointStages = true, oracleRounds = oracleRounds)
    // survivors AND surviving tokens per stage: the token column is the
    // attrition a TRAINING pipeline actually budgets by — and the only
    // place the substring-rewrite stage's effect is visible (it drops
    // tokens, not documents; tokens_removed = the near_dup row minus
    // the substring_rewrite row)
    Seq(
      (0, "corpus", st.corpus),
      (1, "quality_gate", st.gated),
      (2, "exact_dedup", st.exact),
      (3, "near_dup", st.nearDup),
      (4, "substring_rewrite", st.rewritten),
      (5, "decontaminate", st.decon),
      (6, "mixture", st.mixture))
      .map { case (ord, name, df) =>
        df.agg(count(lit(1)).as("survivors"),
          coalesce(sum(col("ws_tokens")), lit(0L)).as("ws_tokens"))
          .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
            col("survivors"), col("ws_tokens"))
      }
      .reduce(_.union(_))
      .orderBy(col("stage_ord"))
  }

  /** The composed pipeline's per-stage survivor frames — one builder
    * shared by [[fullCuration]] (returns the mixture) and
    * [[fullCurationAudit]] (counts every stage), so the audit audits
    * exactly the run that ships.
    */
  private final case class CurationStages(corpus: DataFrame, gated: DataFrame,
      exact: DataFrame, nearDup: DataFrame, rewritten: DataFrame,
      decon: DataFrame, mixture: DataFrame, rewrittenText: DataFrame)

  private def curationStages(t: Tables, benchSize: Long, shingleK: Int,
      minShared: Long, totalBudget: Long, numHashes: Int,
      bands: Int, threshold: Double, weight: Column,
      rewriteK: Int = 8, rewriteMinSpan: Int = 16,
      checkpointStages: Boolean = false,
      oracleRounds: Option[Int] = None): CurationStages = {
    // identity barrier when auditing (multi-consumer stages), no-op for
    // the single-consumer dc9 chain — same logic either way, so the
    // audit still audits exactly the shipped pipeline
    def materialized(df: DataFrame): DataFrame =
      if (checkpointStages) df.localCheckpoint(true) else df
    import graft.operators.{TextAnalysis => TA}
    // ---- stage 1: gate. One projection computes the dc6 metric panel
    // plus everything later stages need; the filter keeps the default
    // dc6 rules (shared formulas — the stages cannot drift).
    val metrics = TA.gateMetricsOf(
      spreadIfNarrow(t.documents.filter(col("doc_id") >= benchSize)
        .select(col("doc_id"), col("source"), col("text"))),
      keep = Seq(col("source"), col("text"), col("toks")))
    val gated = metrics.filter(
      col("n_tokens") >= 16 && col("punct_ratio") <= 0.10 && col("stop_ratio") >= 0.01 &&
        col("dup_token_frac") <= 0.68 && col("top_token_frac") <= 0.16 &&
        col("dup_2gram_frac") <= 0.08)
    // the compact per-doc base: text and tokens die HERE, map-side —
    // nothing heavier than a 64-long signature ever reaches a shuffle
    val base = gated.select(
      col("doc_id"), col("source"), col("quality_score"),
      md5(col("text")).as("content_hash"),
      size(col("toks")).cast("long").as("ws_tokens"),
      when(size(col("toks")) > 1,
        shingle_minhash(col("toks"), 2, numHashes, 42L)).as("sig"))
      .localCheckpoint(true) // feeds exact-dedup + later branches
    // ---- stage 2: exact dedup (d1): keep min doc_id per content hash
    val exactKeep = base.groupBy(col("content_hash")).agg(min(col("doc_id")).as("doc_id"))
    // checkpoints are materialized COLUMN-COMPLETE (no pruning below a
    // barrier), so each stage's barrier carries only what later stages
    // read — content_hash dies here (only exactKeep, derived from
    // `base`, ever groups on it)
    val s2 = base.join(exactKeep.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .drop("content_hash")
      .localCheckpoint(true) // feeds banding, 2 sig attaches, keeper, decon, mixture
    // ---- stage 3: near-dup clusters (d2 pairs → d6 propagation) + dc3 keeper
    val sigs = s2.select(col("doc_id"), col("sig"))
    val pairs = Dedup.lshCandidates(sigs, bands)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .filter(sig_agreement(col("sig_a"), col("sig_b")).cast("double") / numHashes >= threshold)
      .select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.clustersOfPairs(pairs, oracleRounds = oracleRounds)
    val keepers = clusters
      .join(s2.select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(col("quality_score"), (-col("doc_id")).as("nid"))).as("keeper_id"))
    val dropIds = clusters.join(keepers, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("keeper_id"))
      .select(col("doc_id"))
    // the 64-long signature dies here: later stages read only ids,
    // source, quality and the PRE-rewrite token count (the audit's
    // near_dup row) — when the audit materializes this barrier, the
    // checkpoint carries 4 compact columns instead of the sig array
    val s3 = materialized(s2.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("quality_score"), col("ws_tokens")))
    // ---- stage 4: SUBSTRING REWRITE (d20 over the near-dup survivors):
    // the text a trainer actually packs — duplicated cross-doc spans
    // are cut (keep-lowest-doc_id) BEFORE decontamination sees the
    // shingles and BEFORE the mixture counts tokens, so (a) decon
    // judges the text that ships, not spans the rewrite deletes anyway,
    // and (b) the token budget buys deduplicated tokens. Survivor ids
    // BROADCAST into a second corpus scan to re-attach text map-side
    // (token arrays still never enter a keyed exchange — the kept-token
    // signals below are computed map-side before any join; at corpus
    // scale the stages run store-backed and this composition's spans
    // come from the persisted d17 store, exactly d9's 100 TB note).
    val survText = t.documents.filter(col("doc_id") >= benchSize)
      .join(broadcast(s3.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val kept = Dedup.substringRewriteKept(survText, rewriteK, rewriteMinSpan)
    val keptSignals = kept.select(col("doc_id"),
      size(col("kept")).cast("long").as("ws_tokens"),
      when(size(col("kept")) >= shingleK,
        array_distinct(shingle_hashes(col("kept"), shingleK)))
        .otherwise(array().cast("array<bigint>")).as("shingles"))
    // quality_score's last read is the keeper argmax above — the
    // rewrite barrier carries (id, source, rewritten token count,
    // rewritten shingles) only
    val srw = materialized(s3.select(col("doc_id"), col("source"))
      .join(keptSignals, Seq("doc_id")))
    // ---- stage 5: decontamination (dc1) over the REWRITTEN shingles:
    // the eval slice is UNgated — benchmark docs are what they are,
    // only the training side is curated
    val benchSh = t.documents.filter(col("doc_id") < benchSize)
      .select(ws_tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= shingleK)
      .select(explode(array_distinct(shingle_hashes(col("toks"), shingleK))).as("shingle"))
      .distinct()
    val contaminated = srw.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    // the shingle arrays' last read is the contamination probe above —
    // the decon barrier (and the mixture it feeds) carries 3 compact
    // columns
    val s4 = materialized(srw.select(col("doc_id"), col("source"), col("ws_tokens"))
      .join(contaminated, Seq("doc_id"), "left_anti"))
    // ---- stage 6: mixture (dc4's exact core) over the survivors'
    // REWRITTEN token counts
    val mixture = mixtureOf(s4.select(col("doc_id"), col("source"), col("ws_tokens")),
      totalBudget, weight)
    CurationStages(
      corpus = t.documents.filter(col("doc_id") >= benchSize)
        .select(col("doc_id"), size(ws_tokens(col("text"))).cast("long").as("ws_tokens")),
      gated = base, exact = s2, nearDup = s3, rewritten = srw,
      decon = s4, mixture = mixture,
      rewrittenText = kept.select(col("doc_id"),
        array_join(col("kept"), " ").as("text")))
  }

  /** dc11: DSIR data selection — the importance-RESAMPLING step t11's
    * weights exist for (Xie et al. 2023): rank every raw doc by its
    * per-token importance weight and keep the best until a global token
    * budget fills. The rank key is the per-token weight ROUNDED to 4
    * decimals (engines agree on the order exactly; reassociation noise
    * is ~1e-12) with dc2's md5 tie-break, so the selection replays
    * bit-identically anywhere.
    *
    * Scale shape: t11's map-side scoring (one scan, zero shuffle), then
    * [[Ranking.globalRunningSum]] over compact (doc_id, n_tokens,
    * score) rows — a GLOBAL budget cut with no single-task window,
    * which dc2/dc4's per-source windows cannot express. Text never
    * leaves the scan.
    */
  def dsirSelect(t: Tables, benchSplit: Long = 50, buckets: Int = 1024,
      tokenBudget: Long = 20000): DataFrame = {
    val lam = TextAnalysis.dsirLambda(t.documents, benchSplit, buckets)
    val feats = TextAnalysis.dsirFeats(col("text"))
    val scored = t.documents.filter(col("doc_id") >= benchSplit)
      .select(col("doc_id"),
        size(ws_tokens(col("text"))).cast("long").as("n_tokens"),
        round(bucket_weight_sum(feats, lam.toSeq) / size(feats).cast("double"), 4)
          .as("score"))
    Ranking.globalRunningSum(scored,
        Seq(col("score").desc, md5(col("doc_id").cast("string")), col("doc_id")),
        col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("n_tokens"), col("score"), col("cum_tokens"))
      .orderBy(col("cum_tokens"))
  }

  /** dc14: LM-perplexity gate — the CCNet/GPT-3-style fluency filter:
    * keep documents whose t12 interpolated-bigram average logprob
    * clears a threshold, reported as a per-source attrition panel
    * (docs in, docs kept, kept fraction, mean kept score). The
    * threshold compares against t12's ALREADY-ROUNDED per-doc score —
    * the same hash-verified doubles in both engines — so a boundary
    * doc can never classify differently cross-engine; kept scores
    * accumulate as DECIMAL(18,6) (exact, order-free — the q31
    * mergeability discipline) and divide once at the end.
    *
    * Scale shape: all the weight is t12's scoring pass (audited at its
    * own key); the gate adds one co-keyed compact join ((doc_id, lp) ⋈
    * (doc_id, source)) and a per-source aggregation of counters — text
    * never enters this operator at all.
    */
  /** dc15: deterministic stratified sampling — exactly `k` docs per
    * stratum (language), chosen by the md5-priority rule dc2/dc4 use
    * (seedless, engine-replayable, stable under re-runs and
    * partitioning). TWO-LEVEL selection so a dominant stratum cannot
    * funnel its whole population through one window task: pass 1 ranks
    * within (stratum, shuffle-partition) — the heavy stratum fans out
    * across the cluster and every partition keeps at most k candidates
    * — pass 2 ranks the ≤ k·P survivors per stratum. "k smallest
    * md5 keys per stratum" is selection-equivalent to the single-window
    * form (spec-asserted) while the per-task row bound is k·P, not the
    * stratum size.
    */
  def stratifiedSample(t: Tables, k: Int = 25): DataFrame =
    stratifiedSampleOf(t.documents, k)

  /** dc15 over any (doc_id, lang) frame — exposed so specs can vary the
    * input partitioning and prove the selection invariant to it.
    */
  def stratifiedSampleOf(docs: DataFrame, k: Int): DataFrame = {
    val key = Seq(md5(col("doc_id").cast("string")), col("doc_id"))
    val w1 = Window.partitionBy(col("lang"), col("pid")).orderBy(key: _*)
    val w2 = Window.partitionBy(col("lang")).orderBy(key: _*)
    docs.select(col("doc_id"), col("lang"))
      .withColumn("pid", spark_partition_id())
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  def perplexityGate(t: Tables, minAvgLogprob: Double = -3.41): DataFrame = {
    val kept = col("avg_logprob") >= minAvgLogprob
    TextAnalysis.bigramLogprob(t)
      .join(t.documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(when(kept, col("avg_logprob").cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)))).as("lp_sum"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 6).as("kept_frac"),
        round(col("lp_sum").cast("double") / col("n_kept"), 6).as("avg_kept_lp"))
      .orderBy(col("source"))
  }
}
