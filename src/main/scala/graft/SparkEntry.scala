package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q2LookupJoin(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => Relational.q1Agg(Tables(s, dir))),
    "q2_lookup_join" -> ((s, dir) => Relational.q2LookupJoin(Tables(s, dir))),
    "q3_topk_pergroup" -> ((s, dir) => Relational.q3TopkPerGroup(Tables(s, dir))),
    "q4_upsert" -> ((s, dir) => Relational.q4Upsert(Tables(s, dir))),
    "q5_anti_insert" -> ((s, dir) => Relational.q5AntiInsert(Tables(s, dir))),
    "q6_standings" -> ((s, dir) => Relational.q6Standings(Tables(s, dir))),
    "q7_running_total" -> ((s, dir) => Relational.q7RunningTotal(Tables(s, dir))),
    "q8_time_parse" -> ((s, dir) => Relational.q8TimeParse(Tables(s, dir))),
    "q9_incremental" -> ((s, dir) => Relational.q9Incremental(Tables(s, dir))),
    "q10_sanitize" -> ((s, dir) => Relational.q10Sanitize(Tables(s, dir))),
    "q11_sync_stats" -> ((s, dir) => Relational.q11SyncStats(Tables(s, dir))),
    "q12_pivot" -> ((s, dir) => Relational.q12Pivot(Tables(s, dir), EventTypes)),
    "q13_order_revenue" -> ((s, dir) => Relational.q13OrderRevenue(Tables(s, dir))),
    "q14_json_extract" -> ((s, dir) => Relational.q14JsonExtract(Tables(s, dir))),
    "q15_asof_join" -> ((s, dir) => Relational.q15AsofJoin(Tables(s, dir))),
    "q16_quantiles" -> ((s, dir) => Relational.q16Quantiles(Tables(s, dir))),
    "q17_rollup" -> ((s, dir) => Relational.q17Rollup(Tables(s, dir))),
    "q18_corr_subquery" -> ((s, dir) => Relational.q18CorrSubquery(Tables(s, dir))),
    "q19_hash_split" -> ((s, dir) => Relational.q19HashSplit(Tables(s, dir))),
    "q20_funnel" -> ((s, dir) => Relational.q20Funnel(Tables(s, dir))),
    "q21_range_join" -> ((s, dir) => RangeJoin.purchasesInSignupWindows(Tables(s, dir))),
    "q22_hll_distinct" -> ((s, dir) => Relational.q22HllDistinct(Tables(s, dir))),
    "q23_salted_join" -> ((s, dir) => Relational.q23SaltedJoin(Tables(s, dir))),
    "q24_hist_quantiles" -> ((s, dir) => Relational.q24HistQuantiles(Tables(s, dir))),
    "q25_hll_rollup" -> ((s, dir) => Relational.q25HllRollup(Tables(s, dir))),
    "q26_retention" -> ((s, dir) => Relational.q26RetentionCohorts(Tables(s, dir))),
    "q27_profile" -> ((s, dir) => Profile.lineitemProfile(Tables(s, dir))),
    "q28_bloom_join" -> ((s, dir) => Relational.q28BloomJoin(Tables(s, dir))),
    "q29_kmv_distinct" -> ((s, dir) => Relational.q29KmvDistinct(Tables(s, dir))),
    "q30_kmv_overlap" -> ((s, dir) => Relational.q30KmvOverlap(Tables(s, dir))),
    "q31_incremental_rollup" -> ((s, dir) => Relational.q31IncrementalRollup(Tables(s, dir))),
    // §2.2 dedup
    "d1_dedup_exact" -> ((s, dir) => Dedup.exact(Tables(s, dir))),
    "d2_dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(Tables(s, dir))),
    "d3_dedup_simhash" -> ((s, dir) => Dedup.simhash(Tables(s, dir))),
    "d4_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(Tables(s, dir))),
    "d12_containment" -> ((s, dir) => Dedup.containment(Tables(s, dir))),
    "d13_boilerplate" -> ((s, dir) => Dedup.boilerplate(Tables(s, dir))),
    "d5_dedup_embed" -> ((s, dir) => Dedup.embeddingNearDup(Tables(s, dir))),
    "d6_dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(Tables(s, dir), oracleRounds = Some(OracleReplicas.PointerJumpIters))),
    "d7_dedup_incremental" -> ((s, dir) => Dedup.minhashIncremental(Tables(s, dir))),
    "d8_semdedup" -> ((s, dir) => Dedup.semDedup(Tables(s, dir))),
    "d9_substring_dedup" -> ((s, dir) => Dedup.substringSpans(Tables(s, dir))),
    "d10_substring_incremental" -> ((s, dir) => Dedup.substringSpansIncremental(Tables(s, dir))),
    "d20_substring_rewrite" -> ((s, dir) => Dedup.substringRewrite(Tables(s, dir))),
    "d21_rewrite_ingest" -> ((s, dir) => {
      // d17's store pattern for the REWRITE transform: drop → build the
      // corpus half's positional-shingle store → emit the CLEANED batch
      // (spans cut from the new side, corpus untouched). Output ≡ the
      // in-job one-sided replay, so a store-layer failure fails the
      // DuckDB gate itself
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d21_store", Seq("shingles"))
      Dedup.buildSubstringStore(t.documents.filter(col("doc_id") < 250), "d21_store")
      Dedup.substringRewriteAgainstStore("d21_store",
        t.documents.filter(col("doc_id") >= 250))
    }),
    "d11_url_dedup" -> ((s, dir) => Urls.urlDedup(Tables(s, dir))),
    "d14_fuzzy_join" -> ((s, dir) => Dedup.fuzzyJoin(Tables(s, dir))),
    "d15_shingle_novelty" -> ((s, dir) => Dedup.shingleNovelty(Tables(s, dir))),
    "d16_store_probe" -> ((s, dir) => {
      // the persisted-store path through the DuckDB gate: rebuild the
      // corpus-half signature store from scratch (drop → build →
      // publish), then probe it with the fresh half. Output ≡ d7's
      // in-job recompute, so the whole warehouse-store layer (bucketed
      // write, generation claim/publish/resolve, co-partitioned
      // store-side read) is ORACLE-verified end to end, not just
      // spec-verified bit-equal (WarehouseSpec)
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d16_store", Seq("bands", "sigs"))
      Dedup.buildSignatureStore(t.documents.filter(col("doc_id") < 250), "d16_store")
      Dedup.minhashIncrementalAgainstStore("d16_store",
        t.documents.filter(col("doc_id") >= 250))
    }),
    "d17_substr_store_probe" -> ((s, dir) => {
      // d16's pattern for the SUBSTRING store: drop → build the corpus
      // half's positional-shingle occurrence table (bucketed on the
      // hash, generation claim/publish) → probe with the fresh half.
      // Output ≡ d10's in-job recompute, so a store-layer failure
      // (stale generation, lost occurrence rows, broken bucket layout)
      // fails the DuckDB gate itself, not only WarehouseSpec
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d17_store", Seq("shingles"))
      Dedup.buildSubstringStore(t.documents.filter(col("doc_id") < 250), "d17_store")
      Dedup.substringSpansAgainstStore("d17_store",
        t.documents.filter(col("doc_id") >= 250))
    }),
    "d22_takedown_probe" -> ((s, dir) => {
      // TAKEDOWN through the gate: build the corpus-half signature
      // store, append an ingest segment, REMOVE ids spanning both the
      // base and the segment (the right-to-be-forgotten cascade's
      // signature layer), then probe with the fresh half. The oracle
      // replays d7 over the FILTERED corpus — so the removal's declared
      // contract (probe ≡ a store rebuilt from the filtered corpus,
      // across segments) is DuckDB-verified, not just spec-verified
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d22_store", Seq("bands", "sigs"))
      Dedup.buildSignatureStore(t.documents.filter(col("doc_id") < 200), "d22_store")
      Dedup.appendToSignatureStore(
        t.documents.filter(col("doc_id") >= 200 && col("doc_id") < 250), "d22_store")
      Dedup.removeFromSignatureStore(
        t.documents.filter(
          (col("doc_id") >= 100 && col("doc_id") < 150) ||
            (col("doc_id") >= 210 && col("doc_id") < 220)).select(col("doc_id")),
        "d22_store")
      Dedup.minhashIncrementalAgainstStore("d22_store",
        t.documents.filter(col("doc_id") >= 250))
    }),
    "d19_cluster_maintenance" -> ((s, dir) => {
      // the dedup ingest loop's CLUSTER layer through the gate: build
      // the corpus half's signature store, DERIVE its persisted labeling
      // from that store (the text is hashed exactly once — the labeling
      // reads the bucketed sigs/bands tables, production's composition),
      // then absorb the fresh half — old connectivity re-enters as star
      // edges (doc → cluster min), the batch contributes cross pairs
      // (store probe) + batch-internal pairs, and the maintained
      // labeling must equal d6's full-corpus recompute EXACTLY (its
      // oracle verbatim). History is never re-paired: a wrong star
      // edge, lost label row, or missed cross pair fails correctness
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d19_sigs", Seq("bands", "sigs"))
      graft.sources.Warehouse.dropStore(s, "d19_clusters", Seq("labels"))
      val half = t.documents.filter(col("doc_id") < 250)
      Dedup.buildSignatureStore(half, "d19_sigs")
      Dedup.buildClusterStoreFromSignatureStore(s, "d19_sigs", "d19_clusters")
      // threshold passed EXPLICITLY (the build call's 0.5 default): at
      // scale factors where the corpus half yields zero pairs the labels
      // table is EMPTY and the 0.0 DERIVE sentinel refuses by design —
      // the maintain must continue the build's clustering definition
      Dedup.maintainClustersAgainstStore("d19_clusters", "d19_sigs",
        t.documents.filter(col("doc_id") >= 250), threshold = 0.5,
        oracleRounds = Some(OracleReplicas.PointerJumpIters))
    }),
    "d18_novelty_store_probe" -> ((s, dir) => {
      // d16's pattern for the NOVELTY index — the last persisted store
      // promoted to the gate: drop → build the corpus half's distinct-doc
      // df per k-shingle hash (bucketed on h, generation claim/publish) →
      // score the fresh half against it co-partitioned. Novel = absent
      // from the CORPUS (d15's df = 1 rule at ingest); a store-layer
      // failure now fails correctness, not only WarehouseSpec
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "d18_store", Seq("shdf"))
      Dedup.buildNoveltyStore(t.documents.filter(col("doc_id") < 250), "d18_store")
      Dedup.noveltyAgainstStore("d18_store",
        t.documents.filter(col("doc_id") >= 250))
    }),
    // §2.3 similarity search
    "s1_ann_brute" -> ((s, dir) => Similarity.bruteForce(Tables(s, dir))),
    "s2_ann_ivf" -> ((s, dir) => Similarity.ivf(Tables(s, dir))),
    "s3_ann_lsh" -> ((s, dir) => Similarity.lshTopK(Tables(s, dir))),
    "s4_knn_graph" -> ((s, dir) => Similarity.knnGraph(Tables(s, dir))),
    "s5_ann_pq" -> ((s, dir) => ProductQuant.pqTopK(Tables(s, dir))),
    "s6_ann_ivfpq" -> ((s, dir) => ProductQuant.ivfPqTopK(Tables(s, dir))),
    "s12_ann_ivfpq_residual" -> ((s, dir) => ProductQuant.ivfPqResidualTopK(Tables(s, dir))),
    "s10_ivf_index_probe" -> ((s, dir) => {
      // the persisted-IVF-index path through the DuckDB gate: rebuild
      // the partitioned index (generation claim → partitionBy(cid)
      // write → publish, old generations vacuumed), then probe it.
      // Output ≡ s2's in-job IVF (same deterministic k-means), so an
      // index-layout bug — wrong partition pruning, stale generation
      // resolve, centroid/assignment mismatch — fails correctness
      val t = Tables(s, dir)
      // per-SF root: a bench at one scale and a gate run at another must
      // not resolve each other's published generations (the vacuum here
      // also runs ungated at minAge 0)
      val root = s"${sys.props("java.io.tmpdir")}/graft_s10_ivf_${new java.io.File(dir).getName}"
      Similarity.buildIvfIndex(t, root)
      graft.sources.Warehouse.vacuumPathGenerations(root, keep = 1, minAgeMs = 0L)
      Similarity.searchIvfIndex(t, root)
    }),
    "s11_ivf_append_probe" -> ((s, dir) => {
      // the segment-append ingest path through the gate: build the index
      // on the FIRST HALF of the corpus (k-means trains there, centroids
      // freeze), append the second half as a published segment routed by
      // the frozen centroids, then probe base ∪ segment. The oracle
      // replays the same frozen-centroid chain (training restricted to
      // the first half, assignment over everything), so a segment-layout
      // bug — lost segment rows, stale base resolve, a segment of a
      // superseded base leaking in — fails correctness
      val t = Tables(s, dir)
      val emb = t.embeddings.select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      val half = emb.count() / 2 // one bounded driver scalar (split point)
      // per-SF root — the s10 cross-scale isolation argument
      val root = s"${sys.props("java.io.tmpdir")}/graft_s11_ivf_${new java.io.File(dir).getName}"
      Similarity.buildIvfIndexOf(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < half), root)
      Similarity.appendToIvfIndex(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") >= half), root)
      Similarity.vacuumIvfIndex(root, minAgeMs = 0L)
      Similarity.searchIvfIndex(t, root)
    }),
    // §2.4 text analysis
    "t1_langid" -> ((s, dir) => TextAnalysis.langId(Tables(s, dir))),
    "t2_quality" -> ((s, dir) => TextAnalysis.quality(Tables(s, dir))),
    "t3_tokens" -> ((s, dir) => TextAnalysis.tokens(Tables(s, dir))),
    "t4_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(Tables(s, dir))),
    "t5_vocab" -> ((s, dir) => TextAnalysis.vocab(Tables(s, dir))),
    "t6_tfidf" -> ((s, dir) => TextAnalysis.tfidf(Tables(s, dir))),
    "t5_vocab_sketch" -> ((s, dir) => TextAnalysis.vocabSketch(Tables(s, dir))),
    "t7_repetition" -> ((s, dir) => TextAnalysis.repetition(Tables(s, dir))),
    "t8_unigram_logprob" -> ((s, dir) => TextAnalysis.unigramLogprob(Tables(s, dir))),
    "t9_pii_redact" -> ((s, dir) => TextAnalysis.piiScrub(Tables(s, dir))),
    "t10_token_entropy" -> ((s, dir) => TextAnalysis.tokenEntropy(Tables(s, dir))),
    "t11_dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(Tables(s, dir))),
    "t12_bigram_logprob" -> ((s, dir) => TextAnalysis.bigramLogprob(Tables(s, dir))),
    "t13_bpe_merges" -> ((s, dir) => Bpe.bpeMerges(Tables(s, dir))),
    "t14_bpe_encode" -> ((s, dir) => Bpe.bpeEncode(Tables(s, dir))),
    "t15_cms_freq" -> ((s, dir) => TextAnalysis.cmsTokenFreq(Tables(s, dir))),
    "t16_pmi_collocations" -> ((s, dir) => TextAnalysis.pmiCollocations(Tables(s, dir))),
    "t17_bm25" -> ((s, dir) => TextAnalysis.bm25(Tables(s, dir))),
    "t18_zipf" -> ((s, dir) => TextAnalysis.zipfFit(Tables(s, dir))),
    "t19_kl_drift" -> ((s, dir) => TextAnalysis.klDrift(Tables(s, dir))),
    "t20_textrank" -> ((s, dir) => TextAnalysis.textrankKeywords(Tables(s, dir))),
    "t21_bpe_store_probe" -> ((s, dir) => {
      // the persisted BPE dictionary through the gate (d16's pattern):
      // drop → buildDictStore (train merges once, dict + merges tables
      // published under a generation) → encode against the stored dict.
      // Output ≡ t14's in-job train+encode, so a corrupted dict row or
      // stale generation fails correctness, not only WarehouseSpec
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "t21_store", Seq("dict", "merges"))
      Bpe.buildDictStore(t, "t21_store")
      Bpe.bpeEncodeAgainstStore(t, "t21_store")
    }),
    "t22_bm25_store_probe" -> ((s, dir) => {
      // the persisted BM25 inverted index through the gate: drop →
      // buildBm25Store (postings bucketed on token + 1-row stats) →
      // query against the stored index (bucket-pruned IN-list scan).
      // Output ≡ t17's in-job scoring over the same corpus
      val t = Tables(s, dir)
      graft.sources.Warehouse.dropStore(s, "t22_store", Seq("postings", "stats"))
      TextAnalysis.buildBm25Store(t.documents, "t22_store")
      TextAnalysis.bm25AgainstStore(s, "t22_store")
    }),
    "t23_bm25_append_probe" -> ((s, dir) => {
      // the BM25 segment-append ingest path through the gate: build the
      // index on the FIRST HALF of the corpus, append the second half as
      // a published segment (additive df/stats, same bucket layout),
      // then query base ∪ segment. Scores are bit-identical to a
      // one-shot build over the union, so the output ≡ t17's in-job
      // scoring over the FULL corpus — a segment bug (lost postings,
      // double-counted stats, stale base resolve) fails correctness
      val t = Tables(s, dir)
      val half = t.documents.count() / 2 // one bounded driver scalar
      graft.sources.Warehouse.dropStore(s, "t23_store", Seq("postings", "stats"))
      TextAnalysis.buildBm25Store(
        t.documents.filter(org.apache.spark.sql.functions.col("doc_id") < half), "t23_store")
      TextAnalysis.appendToBm25Store(
        t.documents.filter(org.apache.spark.sql.functions.col("doc_id") >= half), "t23_store")
      graft.sources.Warehouse.vacuumSegmentedStore(
        s, "t23_store", Seq("postings", "stats"), minAgeMs = 0L)
      TextAnalysis.bm25AgainstStore(s, "t23_store")
    }),
    "s7_hybrid_rrf" -> ((s, dir) => Similarity.hybridRrf(Tables(s, dir))),
    // §2.7 corpus curation
    "dc1_decontaminate" -> ((s, dir) => Curation.decontaminate(Tables(s, dir))),
    "dc2_sample_budget" -> ((s, dir) => Curation.sampleToBudget(Tables(s, dir))),
    "dc3_canonical" -> ((s, dir) =>
      Curation.canonicalPerCluster(Tables(s, dir), oracleRounds = Some(OracleReplicas.PointerJumpIters))),
    "dc4_mixture" -> ((s, dir) => Curation.sampleToMixture(Tables(s, dir))),
    "dc5_decontaminate_bloom" -> ((s, dir) => Curation.decontaminateBloom(Tables(s, dir))),
    "dc6_quality_gate" -> ((s, dir) => Curation.qualityGate(Tables(s, dir))),
    "dc7_contamination_report" -> ((s, dir) => Curation.contaminationReport(Tables(s, dir))),
    "dc8_semantic_canonical" -> ((s, dir) =>
      Curation.semanticCanonical(Tables(s, dir), oracleRounds = Some(OracleReplicas.PointerJumpIters))),
    "dc9_full_curation" -> ((s, dir) =>
      Curation.fullCuration(Tables(s, dir), oracleRounds = Some(OracleReplicas.PointerJumpIters))),
    "dc10_curation_audit" -> ((s, dir) =>
      Curation.fullCurationAudit(Tables(s, dir), oracleRounds = Some(OracleReplicas.PointerJumpIters))),
    "dc11_dsir_select" -> ((s, dir) => Curation.dsirSelect(Tables(s, dir))),
    "dc12_neardup_decontaminate" -> ((s, dir) => Curation.neardupDecontaminate(Tables(s, dir))),
    "dc14_perplexity_gate" -> ((s, dir) => Curation.perplexityGate(Tables(s, dir))),
    "dc15_stratified_sample" -> ((s, dir) => Curation.stratifiedSample(Tables(s, dir))),
    "dc16_language_balance" -> ((s, dir) => Curation.languageBalance(Tables(s, dir))),
    "dc17_source_overlap" -> ((s, dir) => Curation.sourceOverlap(Tables(s, dir))),
    // §2.5 multimodal plumbing
    "m1_multimodal" -> ((s, dir) => Multimodal.pipeline(Tables(s, dir))),
    "m4_payload_stats" -> ((s, dir) => Multimodal.payloadStats(Tables(s, dir))),
    "m2_frame_sample" -> ((s, dir) => Multimodal.frames(Tables(s, dir))),
    "m3_binary_neardup" -> ((s, dir) => Multimodal.binaryNearDup(Tables(s, dir))),
    // §2.6 streaming (batch twins; streaming forms tested in StreamingSpec)
    "q32_moving_window" -> ((s, dir) => Relational.movingWindow(Tables(s, dir))),
    "q33_scd2" -> ((s, dir) => Relational.scd2(Tables(s, dir))),
    "q34_attribution" -> ((s, dir) => Relational.q34Attribution(Tables(s, dir))),
    "dc13_contamination_panel" -> ((s, dir) => Curation.contaminationPanel(Tables(s, dir))),
    "q35_unpivot" -> ((s, dir) => Relational.q35Unpivot(Tables(s, dir), EventTypes)),
    "q36_grouping_sets" -> ((s, dir) => Relational.q36GroupingSets(Tables(s, dir))),
    "q37_outliers" -> ((s, dir) => Relational.q37Outliers(Tables(s, dir))),
    "q38_deciles" -> ((s, dir) => Relational.q38Deciles(Tables(s, dir))),
    "q39_mom_revenue" -> ((s, dir) => Relational.momRevenue(Tables(s, dir))),
    "q40_delete_where" -> ((s, dir) => {
      // the corpus-table HALF of a takedown through the gate (d22 is
      // the derived-store half): three zone-mapped appends build a
      // SnapshotTable from the documents slice, a copy-on-write
      // deleteWhereRange removes the takedown range (rewriting ONLY the
      // admitting directory — the other two survive under their old
      // names), and the post-delete read must equal DuckDB's filtered
      // scan. A wrong rewrite (lost rows, resurrected rows, a
      // mis-pruned directory) fails the oracle, not just a spec
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_q40_").toString + "/t"
      val st = new graft.etl.SnapshotTable(s, root)
      val docs = t.documents.select(col("doc_id"), col("source"), col("n_chars"))
      st.appendIndexed(docs.filter(col("doc_id") < 150), Seq("doc_id"))
      st.appendIndexed(docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), Seq("doc_id"))
      st.appendIndexed(docs.filter(col("doc_id") >= 300), Seq("doc_id"))
      st.deleteWhereRange("doc_id", 160L, 240L)
      st.read().orderBy(col("doc_id"))
    }),
    "q41_restore" -> ((s, dir) => {
      // the RECOVERY flip side of q40: same three zone-mapped appends,
      // same copy-on-write takedown delete — then restore(version
      // before the delete) publishes the pre-delete directory list as a
      // NEW version (one manifest commit, zero data rewrite), and the
      // restored read must equal DuckDB's FULL corpus scan. A restore
      // that loses rows, resurrects the wrong version, or re-reads a
      // rewritten directory fails the oracle; version arithmetic,
      // history intactness and the vacuum refusal are spec-asserted
      import org.apache.spark.sql.functions.col
      val t = Tables(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_q41_").toString + "/t"
      val st = new graft.etl.SnapshotTable(s, root)
      val docs = t.documents.select(col("doc_id"), col("source"), col("n_chars"))
      st.appendIndexed(docs.filter(col("doc_id") < 150), Seq("doc_id"))
      st.appendIndexed(docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), Seq("doc_id"))
      val beforeDelete = st.appendIndexed(docs.filter(col("doc_id") >= 300), Seq("doc_id"))
      st.deleteWhereRange("doc_id", 160L, 240L)
      st.restore(beforeDelete)
      st.read().orderBy(col("doc_id"))
    }),
    "st1_stream_window" -> ((s, dir) => graft.streaming.EventPipelines.windowedCountsBatch(Tables(s, dir))),
    "st2_sessionize" -> ((s, dir) => graft.streaming.EventPipelines.sessionizeBatch(Tables(s, dir))),
    // §2.8 training-sequence assembly
    "p1_sequence_pack" -> ((s, dir) => Packing.sequencePack(Tables(s, dir))),
    "p2_pack_stats" -> ((s, dir) => Packing.packStats(Tables(s, dir))),
    "p5_shard_manifest" -> ((s, dir) => Packing.shardManifest(Tables(s, dir))),
    "p3_epoch_interleave" -> ((s, dir) => Packing.epochInterleave(Tables(s, dir))),
    "p4_length_buckets" -> ((s, dir) => Packing.lengthBuckets(Tables(s, dir))),
    // §2.9 graph analytics
    "g1_pagerank" -> ((s, dir) => Graph.pagerank(Tables(s, dir))),
    "g2_triangle_count" -> ((s, dir) => Graph.triangleCounts(Tables(s, dir))),
    "g3_edge_embeddedness" -> ((s, dir) => Graph.edgeEmbeddedness(Tables(s, dir))),
    "g4_components" -> ((s, dir) =>
      Graph.connectedComponents(Tables(s, dir), oracleRounds = Some(G4OracleIters))),
    "g5_personalized_pagerank" -> ((s, dir) => Graph.personalizedPagerank(Tables(s, dir))),
    "g6_hop_distance" -> ((s, dir) => Graph.hopDistance(Tables(s, dir))),
    "g7_label_communities" -> ((s, dir) => Graph.labelCommunities(Tables(s, dir))),
    "g8_clustering_coeff" -> ((s, dir) => Graph.clusteringCoeff(Tables(s, dir))),
    "g9_weighted_pagerank" -> ((s, dir) => Graph.weightedPagerank(Tables(s, dir))),
    "g10_triangle_sample" -> ((s, dir) => Graph.triangleSample(Tables(s, dir))),
    // m5's plants: bytes differ (2nd char flipped) but the decoded
    // thumbnail is IDENTICAL — for len > 64 the sampler touches
    // positions 1 and ≥3 only, so the flip is representation-invisible
    // and byte-hash dedup provably misses what m5 catches
    "m5_thumb_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, concat, expr, length, lit, substring}
      val base = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val plants = base.filter(col("doc_id") < 50 && length(col("text")) > 64)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(substring(col("text"), 1, 1), lit("~"),
            expr("substring(text, 3)")).as("text"))
      // eager checkpoint: Union's constraint rewriting trips over the
      // plants branch's filtered-then-projected lineage (Spark maps the
      // propagated length(text) constraint against the projected-away
      // attribute); the checkpoint starts the downstream thumbnail plan
      // from a clean scan
      Multimodal.thumbDedupOf(base.unionByName(plants).localCheckpoint(true))
    }),
    "s8_range_search" -> ((s, dir) => Similarity.rangeSearch(Tables(s, dir))),
    "s9_ivf_range" -> ((s, dir) => Similarity.ivfRange(Tables(s, dir))),
  )

  import OracleReplicas.{fnv64Sql, signed64, jhashSql, signed32, charBytes}

  /** Shared CTE body for the exact-shingle-Jaccard oracle (d4):
    * distinct word-2-gram shingles per doc, inverted-index pair
    * intersection counts, Jaccard ratio.
    */
  private val jaccardCtes: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS shingle
      |    FROM toks WHERE len(t) > 1) z),
      |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |j AS (
      |  SELECT doc_a, doc_b, CAST(shared AS DOUBLE) / (sa.nsh + sb.nsh - shared) AS jac
      |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)""".stripMargin

  /** Shared CTE body for the DSIR oracles (t11 scoring, dc11 selection):
    * FNV unigram/bigram feature hashes → mod-1024 buckets → per-doc and
    * per-bucket counts → add-1-smoothed target/raw log-ratio λ table.
    * Mirrors [[graft.operators.TextAnalysis.dsirLambda]]/[[graft.operators.TextAnalysis.dsirFeats]].
    */
  private lazy val dsirCtes: String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |uni AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
       |    i -> ${fnv64Sql("t[i] || chr(31)")})) AS h FROM toks),
       |bi AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> ${fnv64Sql("t[i] || chr(31) || t[i+1] || chr(31)")})) AS h
       |  FROM toks WHERE len(t) > 1),
       |feats AS (
       |  SELECT doc_id, CAST(h % 1024 AS BIGINT) AS b
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) z),
       |perdoc AS (SELECT doc_id, b, COUNT(*) AS c FROM feats GROUP BY doc_id, b),
       |byb AS (
       |  SELECT b,
       |    SUM(CASE WHEN doc_id < 50 THEN c ELSE 0 END) AS ct,
       |    SUM(CASE WHEN doc_id >= 50 THEN c ELSE 0 END) AS cr
       |  FROM perdoc GROUP BY b),
       |tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nt, CAST(SUM(cr) AS DOUBLE) AS nr FROM byb),
       |lam AS (
       |  SELECT b, ln((ct + 1.0) / (nt + 1024.0)) - ln((cr + 1.0) / (nr + 1024.0)) AS lam
       |  FROM byb CROSS JOIN tot)""".stripMargin

  /** dc1's oracle — also dc5's: the Bloom-prefiltered plan must produce
    * exactly the unfiltered operator's rows.
    */
  private val dc1Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |  FROM toks WHERE len(t) >= 3) z),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM sh JOIN bench USING (shingle)
      |WHERE doc_id >= 50
      |GROUP BY doc_id HAVING COUNT(*) >= 5
      |ORDER BY doc_id""".stripMargin

  /** Shared CTE body for the p1/p2 packing oracles: per-doc token counts,
    * md5 shard/priority, per-shard running offsets — the exact layout
    * [[graft.operators.Packing.packedDocs]] computes (budget 512).
    */
  private val packCtes: String =
    """c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS pri
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, ws_tokens, pri,
      |    CAST(strpos('0123456789abcdef', substr(pri, 1, 1)) - 1 AS INT) AS shard
      |  FROM c WHERE ws_tokens > 0),
      |p AS (
      |  SELECT doc_id, shard, ws_tokens,
      |    CAST(SUM(ws_tokens) OVER (PARTITION BY shard ORDER BY pri, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ws_tokens AS BIGINT) AS start_tok
      |  FROM s),
      |pd AS (
      |  SELECT doc_id, shard, ws_tokens, start_tok, start_tok + ws_tokens AS end_tok,
      |    start_tok // 512 AS seq_first, (start_tok + ws_tokens - 1) // 512 AS seq_last
      |  FROM p)""".stripMargin

  /** DuckDB-equivalent SQL per query key; the driver hash-compares results
    * (columns sorted by name), so aliases here match the Spark side
    * exactly, money sums go through DECIMAL for order-independence, and
    * integer aggregates are cast to BIGINT (DuckDB SUM(int) is HUGEINT).
    */
  def oracleSql: Map[String, String] = Map(
    "q26_retention" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS wk
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(wk) AS cohort_week FROM weeks GROUP BY user_id)
        |SELECT cohort_week, wk - cohort_week AS week_offset,
        |  COUNT(*) AS n_users
        |FROM weeks JOIN cohorts USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q27: per-column branches replayed with the operator's exact metric
    // shapes (epoch-microsecond doubles for timestamps)
    "q27_profile" -> OracleReplicas.q27Profile(),
    "p1_sequence_pack" ->
      s"""WITH $packCtes
        |SELECT doc_id, shard, ws_tokens, start_tok, seq_first, seq_last,
        |  seq_last - seq_first + 1 AS n_seqs
        |FROM pd
        |ORDER BY shard, start_tok""".stripMargin,
    "p2_pack_stats" ->
      s"""WITH $packCtes,
        |e AS (
        |  SELECT shard, start_tok, end_tok,
        |    unnest(range(seq_first, seq_last + 1)) AS seq_id
        |  FROM pd),
        |g AS (
        |  SELECT shard, seq_id,
        |    COUNT(*) AS n_docs,
        |    CAST(SUM(LEAST(end_tok, (seq_id + 1) * 512) -
        |             GREATEST(start_tok, seq_id * 512)) AS BIGINT) AS fill_tokens,
        |    CAST(SUM(CASE WHEN start_tok < seq_id * 512 OR end_tok > (seq_id + 1) * 512
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
        |  FROM e GROUP BY shard, seq_id)
        |SELECT shard, seq_id, n_docs, fill_tokens, n_spanning,
        |  ROUND(CAST(fill_tokens AS DOUBLE) / 512, 6) AS fill_frac
        |FROM g
        |ORDER BY shard, seq_id""".stripMargin,
    // p5: the checksum folds each md5 prefix's 15 hex chars to HUGEINT
    // (≡ Spark's conv(…,16,10) inside unsigned-64 exactness) and sums
    // as DECIMAL — order-free exact integers. Emitted as a digit STRING:
    // the sum exceeds 2^53, so a float-path canonicalization would be
    // lossy on a numeric column; a string is representation-proof.
    "p5_shard_manifest" ->
      s"""WITH $packCtes,
        |m AS (
        |  SELECT shard, COUNT(*) AS n_docs, CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
        |    CAST(CAST(SUM(list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(string_split(substr(pri, 1, 15), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT))),
        |      (h, d) -> h * 16 + d)) AS DECIMAL(38,0)) AS VARCHAR) AS manifest_hash
        |  FROM s GROUP BY shard)
        |SELECT shard, n_docs, n_tokens, (n_tokens + 511) // 512 AS n_seqs,
        |  ROUND(CAST(n_tokens - ((n_tokens + 511) // 512 - 1) * 512 AS DOUBLE) / 512, 6)
        |    AS tail_fill_frac,
        |  manifest_hash
        |FROM m
        |ORDER BY shard""".stripMargin,
    // p4: the −0.5 keeps log2 off every dyadic boundary, so the floored
    // bucket exponent is ulp-robust cross-engine
    "p4_length_buckets" ->
      """WITH n AS (
        |  SELECT doc_id, len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens,
        |    (CAST(1 AS BIGINT) << (CAST(FLOOR(LOG2(CAST(n_tokens AS DOUBLE) - 0.5)) AS INT) + 1)) AS bucket
        |  FROM n WHERE n_tokens >= 1),
        |g AS (
        |  SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS real_tokens
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n_docs, real_tokens,
        |  bucket * n_docs AS padded_tokens,
        |  ROUND(CAST(bucket * n_docs - real_tokens AS DOUBLE) / (bucket * n_docs), 6) AS waste_frac
        |FROM g
        |ORDER BY bucket""".stripMargin,
    // p3: stride-scheduling keys (r − 0.5)/w are IEEE-exact doubles of
    // small integers, so the two engines' sort keys agree bit-for-bit;
    // the weight expression is dc4's convention verbatim
    "p3_epoch_interleave" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank
        |  FROM documents),
        |w AS (
        |  SELECT DISTINCT source,
        |    CAST(TRY_CAST(substr(source, 4) AS INT) % 3 + 1 AS DOUBLE) AS w
        |  FROM documents),
        |keyed AS (
        |  SELECT doc_id, source, src_rank,
        |    (CAST(src_rank AS DOUBLE) - 0.5) / w AS k
        |  FROM ranked JOIN w USING (source))
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, source, doc_id) AS INT) AS global_pos,
        |  doc_id, source, src_rank
        |FROM keyed
        |ORDER BY global_pos""".stripMargin,
    "s1_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT query_id, vec_id AS neighbor_id, unnest(qe) AS x, unnest(embedding) AS y
        |  FROM q CROSS JOIN embeddings WHERE vec_id <> query_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |  FROM pairs GROUP BY query_id, neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END AS cosf,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END) DESC,
        |               neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, ROUND(cosf, 6) AS cos
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // s8: s1's cosine replay with the rank window replaced by the
    // threshold filter (applied on the UNROUNDED value, matching the
    // Spark filter — the d5 discipline)
    "s8_range_search" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT query_id, vec_id AS match_id, unnest(qe) AS x, unnest(embedding) AS y
        |  FROM q CROSS JOIN embeddings WHERE vec_id <> query_id),
        |scored AS (
        |  SELECT query_id, match_id,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |  FROM pairs GROUP BY query_id, match_id)
        |SELECT query_id, match_id,
        |  ROUND(CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END, 6) AS cos
        |FROM scored
        |WHERE (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END) >= 0.2
        |ORDER BY query_id, cos DESC, match_id""".stripMargin,
    "d4_ngram_jaccard" ->
      (s"WITH $jaccardCtes\n" +
        "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM j WHERE jac >= 0.3 ORDER BY doc_a, doc_b"),
    "d12_containment" ->
      (s"WITH $jaccardCtes,\n" +
        """cont AS (
          |  SELECT doc_a AS doc_inner, doc_b AS doc_outer,
          |    CAST(shared AS DOUBLE) / sa.nsh AS c
          |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a
          |  UNION ALL
          |  SELECT doc_b, doc_a, CAST(shared AS DOUBLE) / sb.nsh
          |  FROM shared JOIN sizes sb ON sb.doc_id = doc_b)
          |SELECT doc_inner, doc_outer, ROUND(c, 4) AS containment
          |FROM cont WHERE c >= 0.8 ORDER BY doc_inner, doc_outer""".stripMargin),
    "d6_dedup_clusters" -> OracleReplicas.d6Clusters(),
    // d19's declared contract is output identity with d6's full-corpus
    // recompute (star edges carry the old components exactly), so it
    // shares d6's replica verbatim — the d16/d17/s10/t21-t23 pattern at
    // the cluster layer
    "d19_cluster_maintenance" -> OracleReplicas.d6Clusters(),
    "dc17_source_overlap" -> OracleReplicas.dc17SourceOverlap(),
    // m4: char-domain byte histogram (ASCII corpus ⇒ ascii(text[i]) ≡
    // payload byte); every metric is integer counts + one exact division,
    // so no cross-engine float drift is possible
    "m4_payload_stats" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1), i -> ascii(text[i]))) AS byte
        |  FROM documents WHERE length(text) > 0),
        |bc AS (SELECT doc_id, byte, COUNT(*) AS c FROM ch GROUP BY doc_id, byte),
        |st AS (
        |  SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, SUM(c * c) AS ss
        |  FROM bc GROUP BY doc_id),
        |md AS (
        |  SELECT doc_id, byte AS mode_byte, c AS mc FROM (
        |    SELECT doc_id, byte, c,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, byte) AS rn
        |    FROM bc) z WHERE rn = 1)
        |SELECT s.doc_id, CAST(s.n AS BIGINT) AS byte_len, CAST(s.nd AS INT) AS n_distinct,
        |  ROUND(CAST(s.ss AS DOUBLE) / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE)), 6) AS collision_prob,
        |  CAST(m.mode_byte AS INT) AS mode_byte,
        |  ROUND(CAST(m.mc AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS mode_frac
        |FROM st s JOIN md m ON m.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "m1_multimodal" ->
      (s"""WITH f AS (
          |  SELECT source, length(text) AS blen,
          |    ${signed64(fnv64Sql("text"))} AS hs
          |  FROM documents)
          |SELECT source,
          |  COUNT(*) AS n_media,
          |  CAST(SUM(blen) AS BIGINT) AS total_bytes,
          |  MIN(hs) AS min_checksum,
          |  AVG(64 + (abs(hs) % 1024)) AS avg_width
          |FROM f GROUP BY source ORDER BY source""".stripMargin),
    "m2_frame_sample" -> {
      val frameStr = "substr(text, CAST(fi * greatest(length(text) - 32, 0) // 2 AS INTEGER) + 1, 32)"
      val thumbBytes = "list_transform(range(16), i -> CAST(unicode(substr(text, CAST(i * length(text) // 16 AS INTEGER) + 1, 1)) AS HUGEINT))"
      s"""SELECT doc_id,
         |  CAST(fi AS INTEGER) AS frame_idx,
         |  CAST(length($frameStr) AS INTEGER) AS frame_bytes,
         |  ${signed32(jhashSql(charBytes(frameStr)))} AS frame_hash,
         |  ${signed32(jhashSql(thumbBytes))} AS thumb_hash
         |FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS fi)
         |ORDER BY doc_id, frame_idx""".stripMargin
    },
    "dc1_decontaminate" -> dc1Sql,
    // dc13: each branch is the corresponding granularity's full oracle
    // reduced to its contaminated-doc count (CTE queries as scalar
    // subqueries), composed in the same 4-row union as the Spark plan
    "dc13_contamination_panel" ->
      s"""SELECT 'exact' AS granularity,
        |  (SELECT CAST(COUNT(DISTINCT c.doc_id) AS BIGINT)
        |   FROM documents c
        |   JOIN (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 50) b
        |     ON md5(c.text) = b.h
        |   WHERE c.doc_id >= 50) AS n_contaminated
        |UNION ALL SELECT 'ngram',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ($dc1Sql) z)
        |UNION ALL SELECT 'neardup',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (${OracleReplicas.dc12NeardupDecontaminate()}) z)
        |UNION ALL SELECT 'substring',
        |  (SELECT CAST(COUNT(DISTINCT new_id) AS BIGINT)
        |   FROM (${OracleReplicas.d10SubstringIncremental(splitId = 50)}) z)
        |ORDER BY granularity""".stripMargin,
    // dc5 is dc1 through a Bloom-prefiltered plan: no false negatives +
    // exact verify stage => identical output, same oracle
    "dc5_decontaminate_bloom" -> dc1Sql,
    "dc2_sample_budget" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, ws_tokens,
        |    CAST(SUM(ws_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM c)
        |SELECT doc_id, source, ws_tokens, cum_tokens FROM s
        |WHERE cum_tokens <= 10000
        |ORDER BY source, cum_tokens""".stripMargin,
    "t7_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |st AS (
        |  SELECT doc_id, len(t) AS n,
        |    len(list_distinct(t)) AS dt,
        |    list_aggregate(list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x))), 'max') AS topc,
        |    GREATEST(len(t) - 1, 0) AS nsh,
        |    len(list_distinct(list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i+1]))) AS dsh
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_tokens,
        |  ROUND(1.0 - dt / GREATEST(n, 1), 6) AS dup_token_frac,
        |  ROUND(topc / GREATEST(n, 1), 6) AS top_token_frac,
        |  ROUND(CASE WHEN nsh > 0 THEN 1.0 - dsh / nsh ELSE 0.0 END, 6) AS dup_2gram_frac
        |FROM st
        |ORDER BY doc_id""".stripMargin,
    "dc4_mixture" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens
        |  FROM documents),
        |wt AS (
        |  SELECT source, CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS DOUBLE) AS w
        |  FROM (SELECT DISTINCT source FROM documents) z),
        |b AS (
        |  SELECT source, CAST(FLOOR(60000.0 * w / (SELECT SUM(w) FROM wt)) AS BIGINT) AS src_budget
        |  FROM wt),
        |s AS (
        |  SELECT doc_id, c.source, ws_tokens, src_budget,
        |    CAST(SUM(ws_tokens) OVER (PARTITION BY c.source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM c JOIN b ON c.source = b.source)
        |SELECT doc_id, source, ws_tokens, cum_tokens, src_budget FROM s
        |WHERE cum_tokens <= src_budget
        |ORDER BY source, cum_tokens""".stripMargin,
    // per-PAIR semantics (vs dc1's union-of-bench-shingles count): the
    // same string-shingle domain replays the FNV-hash join exactly
    // because the hash is collision-negligible on this vocabulary
    "dc7_contamination_report" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |  FROM toks WHERE len(t) >= 3) z),
        |pairs AS (
        |  SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id, COUNT(*) AS shared
        |  FROM sh b JOIN sh c USING (shingle)
        |  WHERE b.doc_id < 50 AND c.doc_id >= 50
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |ranked AS (
        |  SELECT bench_id, corpus_id, shared,
        |    ROW_NUMBER() OVER (PARTITION BY bench_id ORDER BY shared DESC, corpus_id ASC) AS rn
        |  FROM pairs),
        |agg AS (
        |  SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_contaminating,
        |    CAST(MAX(shared) AS BIGINT) AS max_shared
        |  FROM pairs GROUP BY bench_id)
        |SELECT a.bench_id, a.n_contaminating, a.max_shared, r.corpus_id AS worst_doc_id
        |FROM agg a JOIN ranked r ON a.bench_id = r.bench_id AND r.rn = 1
        |ORDER BY a.bench_id""".stripMargin,
    "dc6_quality_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / GREATEST(length(text), 1), 6) AS punct_ratio,
        |    ROUND(CAST(len(list_filter(t,
        |        x -> list_contains(['the','and','of','to','in','is','a','on','for','with'], x))) AS DOUBLE)
        |      / GREATEST(len(t), 1), 6) AS stop_ratio,
        |    len(list_distinct(t)) AS dt,
        |    list_aggregate(list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x))), 'max') AS topc,
        |    GREATEST(len(t) - 1, 0) AS nsh,
        |    len(list_distinct(list_transform(range(1, len(t)), i -> t[i] || chr(31) || t[i+1]))) AS dsh
        |  FROM toks),
        |m AS (
        |  SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
        |    ROUND(0.5 * LEAST(n_tokens, 100) / 100.0
        |        + 0.3 * (1.0 - punct_ratio)
        |        + 0.2 * LEAST(stop_ratio * 5.0, 1.0), 6) AS quality_score,
        |    ROUND(1.0 - dt / GREATEST(n_tokens, 1), 6) AS dup_token_frac,
        |    ROUND(topc / GREATEST(n_tokens, 1), 6) AS top_token_frac,
        |    ROUND(CASE WHEN nsh > 0 THEN 1.0 - dsh / nsh ELSE 0.0 END, 6) AS dup_2gram_frac
        |  FROM base),
        |g AS (
        |  SELECT doc_id, quality_score,
        |    list_filter([
        |      CASE WHEN n_tokens < 16 THEN 'too_short' END,
        |      CASE WHEN punct_ratio > 0.10 THEN 'high_punct' END,
        |      CASE WHEN stop_ratio < 0.01 THEN 'low_stopword' END,
        |      CASE WHEN dup_token_frac > 0.68 THEN 'repetitive_tokens' END,
        |      CASE WHEN top_token_frac > 0.16 THEN 'dominant_token' END,
        |      CASE WHEN dup_2gram_frac > 0.08 THEN 'repetitive_2grams' END],
        |      x -> x IS NOT NULL) AS r
        |  FROM m)
        |SELECT doc_id, len(r) = 0 AS keep,
        |  COALESCE(array_to_string(r, ','), '') AS reasons, quality_score
        |FROM g
        |ORDER BY doc_id""".stripMargin,
    // salting is semantics-preserving: the oracle is the PLAIN join
    "q23_salted_join" ->
      """SELECT l_suppkey, s_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY l_suppkey, s_name
        |ORDER BY l_suppkey""".stripMargin,
    "q24_hist_quantiles" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 5.0), 0), 199) AS INT) AS bin
        |  FROM events),
        |h AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin, c,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM h),
        |q50 AS (
        |  SELECT event_type,
        |    ROUND(0.0 + 5.0 * (bin + (CAST(0.5 AS DOUBLE) * n - (cum - c)) / c), 6) AS p50_est
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bin) AS rn
        |        FROM cum WHERE cum >= CAST(0.5 AS DOUBLE) * n) z
        |  WHERE rn = 1),
        |q95 AS (
        |  SELECT event_type,
        |    ROUND(0.0 + 5.0 * (bin + (CAST(0.95 AS DOUBLE) * n - (cum - c)) / c), 6) AS p95_est
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bin) AS rn
        |        FROM cum WHERE cum >= CAST(0.95 AS DOUBLE) * n) z
        |  WHERE rn = 1),
        |nn AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_rows FROM cum GROUP BY 1)
        |SELECT event_type, p50_est, p95_est, n_rows
        |FROM q50 JOIN q95 USING (event_type) JOIN nn USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // generated replicas of the custom hash/sketch kernels (constants
    // derived from the same splitmix64 streams the expressions use)
    "q22_hll_distinct" -> OracleReplicas.q22HllDistinct(),
    "q25_hll_rollup" -> OracleReplicas.q25HllRollup(),
    "s2_ann_ivf" -> OracleReplicas.s2Ivf(),
    "s9_ivf_range" -> OracleReplicas.s9IvfRange(),
    "s5_ann_pq" -> OracleReplicas.s5Pq(),
    "s6_ann_ivfpq" -> OracleReplicas.s6IvfPq(),
    "s12_ann_ivfpq_residual" -> OracleReplicas.s12IvfPqResidual(),
    "s3_ann_lsh" -> OracleReplicas.s3LshTopK(),
    "d2_dedup_minhash" -> OracleReplicas.d2MinhashLsh(),
    "d7_dedup_incremental" -> OracleReplicas.d7MinhashIncremental(),
    // d16 probes the PERSISTED store instead of recomputing in-job; the
    // declared contract is output-identity with d7, so it shares d7's
    // replica SQL — a store-layer bug (stale generation, bucket-layout
    // corruption, lost rows) now fails the DuckDB gate, not only a spec
    "d16_store_probe" -> OracleReplicas.d7MinhashIncremental(),
    "d22_takedown_probe" -> OracleReplicas.d22TakedownProbe(),
    // d17 probes the PERSISTED positional-shingle store; declared
    // contract is output-identity with d10, so it shares d10's replica
    "d17_substr_store_probe" -> OracleReplicas.d10SubstringIncremental(),
    // s10 probes the PERSISTED cid-partitioned IVF index; declared
    // contract is output-identity with s2, so it shares s2's replica
    "s10_ivf_index_probe" -> OracleReplicas.s2Ivf(),
    // s11 probes base ∪ appended segment; the frozen-centroid contract
    // is s2's replica with k-means TRAINING restricted to the base half
    // (final assignment/probes/candidates still span the whole corpus)
    "s11_ivf_append_probe" -> OracleReplicas.s2Ivf(
      trainPred = "vec_id < (SELECT COUNT(*) FROM embeddings) // 2"),
    "dc12_neardup_decontaminate" -> OracleReplicas.dc12NeardupDecontaminate(),
    "d9_substring_dedup" -> OracleReplicas.d9SubstringSpans(),
    "d13_boilerplate" -> OracleReplicas.d13Boilerplate(),
    // d15: text-shingle replica (FNV hashing is distinctness-preserving
    // on this corpus — the dc1/dc9 shingle-oracle precedent)
    "d15_shingle_novelty" ->
      """WITH dsh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |          FROM documents) z
        |    WHERE len(t) >= 3) y),
        |dfc AS (SELECT shingle, COUNT(*) AS sdf FROM dsh GROUP BY shingle),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS n_sh,
        |    SUM(CASE WHEN sdf = 1 THEN 1 ELSE 0 END) AS novel
        |  FROM dsh JOIN dfc USING (shingle) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_sh, 0) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(novel, 0) AS BIGINT) AS novel_shingles,
        |  CASE WHEN COALESCE(n_sh, 0) = 0 THEN 0.0
        |       ELSE ROUND(CAST(novel AS DOUBLE) / n_sh, 4) END AS novelty_frac
        |FROM documents d LEFT JOIN pd USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "d10_substring_incremental" -> OracleReplicas.d10SubstringIncremental(),
    "d20_substring_rewrite" -> OracleReplicas.d20SubstringRewrite(),
    "d21_rewrite_ingest" -> OracleReplicas.d21SubstringRewriteIngest(),
    // d18: d15's text-shingle replica split at the d16/d17 boundary —
    // the fresh half's shingles LEFT-join the corpus half's distinct
    // shingle set; novel = no corpus row (the absent-from-corpus rule)
    "d18_novelty_store_probe" ->
      """WITH sh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |          FROM documents) z
        |    WHERE len(t) >= 3) y),
        |corp AS MATERIALIZED (SELECT DISTINCT shingle FROM sh WHERE doc_id < 250),
        |pd AS (
        |  SELECT f.doc_id, COUNT(*) AS n_sh,
        |    SUM(CASE WHEN c.shingle IS NULL THEN 1 ELSE 0 END) AS novel
        |  FROM (SELECT * FROM sh WHERE doc_id >= 250) f
        |  LEFT JOIN corp c ON f.shingle = c.shingle
        |  GROUP BY f.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_sh, 0) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(novel, 0) AS BIGINT) AS novel_shingles,
        |  CASE WHEN COALESCE(n_sh, 0) = 0 THEN 0.0
        |       ELSE ROUND(CAST(novel AS DOUBLE) / n_sh, 4) END AS novelty_frac
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
        |LEFT JOIN pd USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // d11: the synthesized crawl-noise URL (host case, www., default
    // port, shuffled tracking params, fragment, trailing slash) and its
    // canonicalization replayed step for step; the tracking-param list
    // is the shared graft.operators.Urls.TrackingRe. DuckDB's
    // regexp_replace is first-match-only — every pattern here is
    // anchored or unique, so it agrees with Spark's replace-all.
    "d11_url_dedup" -> {
      val trackingRe = graft.operators.Urls.TrackingRe
      s"""WITH urls AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
         |    (CASE WHEN doc_id % 3 = 0 THEN upper(source || '.example.com')
         |          WHEN doc_id % 3 = 1 THEN 'WWW.' || source || '.example.com'
         |          ELSE source || '.example.com' END) ||
         |    (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
         |    '/p/' || CAST(doc_id % 12 AS VARCHAR) ||
         |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         |    (CASE WHEN doc_id % 2 = 0
         |      THEN '?a=' || CAST(doc_id % 12 AS VARCHAR) || '&sort=asc&utm_source=feed'
         |      ELSE '?utm_campaign=x&sort=asc&a=' || CAST(doc_id % 12 AS VARCHAR) END) ||
         |    (CASE WHEN doc_id % 2 = 1 THEN '#sec' || CAST(n_chars % 10 AS VARCHAR) ELSE '' END)
         |      AS url
         |  FROM documents),
         |nofrag AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS u FROM urls),
         |parts AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
         |      '^www\\.', '') AS auth0,
         |    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
         |  FROM nofrag),
         |parts2 AS (
         |  SELECT doc_id, scheme,
         |    CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$$', '')
         |         WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$$', '')
         |         ELSE auth0 END AS auth,
         |    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$$', '') AS path0,
         |    regexp_extract(rest, '^[^?]*\\?(.*)$$', 1) AS q0
         |  FROM parts),
         |canon AS (
         |  SELECT doc_id,
         |    scheme || '://' || auth ||
         |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
         |    (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS canon_url
         |  FROM (
         |    SELECT *, array_to_string(list_sort(list_filter(string_split(q0, '&'),
         |        p -> NOT regexp_matches(p, '$trackingRe') AND p <> '')), '&') AS q2
         |    FROM parts2) z)
         |SELECT canon_url, MIN(doc_id) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_urls
         |FROM canon
         |GROUP BY canon_url
         |ORDER BY canon_url""".stripMargin
    },
    "dc3_canonical" -> OracleReplicas.dc3Canonical(),
    "dc8_semantic_canonical" -> OracleReplicas.dc8SemanticCanonical(),
    "dc9_full_curation" -> OracleReplicas.dc9FullCuration(),
    "dc10_curation_audit" -> OracleReplicas.dc10CurationAudit(),
    "d3_dedup_simhash" -> OracleReplicas.d3Simhash(),
    "d5_dedup_embed" -> OracleReplicas.d5EmbedNearDup(),
    // within-cluster cosine domination (SemDeDup stage 2); zipped unnest
    // accumulates the dot/norm sums in the same index order as the Spark
    // kernel, so the DOUBLE cosine and the >= tau cut replay exactly
    "d8_semdedup" ->
      """WITH e AS (SELECT vec_id, label AS cluster_id, embedding FROM embeddings),
        |pairs AS (
        |  SELECT a.cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
        |         unnest(a.embedding) AS x, unnest(b.embedding) AS y
        |  FROM e a JOIN e b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT cluster_id, id_a, id_b,
        |    SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |  FROM pairs GROUP BY 1, 2, 3),
        |cosd AS (
        |  SELECT cluster_id, id_a, id_b,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END AS cos
        |  FROM scored)
        |SELECT id_b AS vec_id, MIN(cluster_id) AS cluster_id, MIN(id_a) AS kept_by,
        |  ROUND(arg_min(cos, id_a), 4) AS cos_to_keeper
        |FROM cosd WHERE cos >= 0.3
        |GROUP BY id_b ORDER BY vec_id""".stripMargin,
    "t4_fingerprint" -> OracleReplicas.t4Fingerprint(),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_lookup_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q3_topk_pergroup" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) x
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q4_upsert" ->
      """SELECT user_id, event_type, event_id AS last_event_id, value AS last_value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q5_anti_insert" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q6_standings" ->
      """SELECT s_suppkey, s_name, points, win_count,
        |  CAST(ROW_NUMBER() OVER (ORDER BY points DESC, s_suppkey) AS INT) AS position
        |FROM (
        |  SELECT s_suppkey, s_name,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS points,
        |    COUNT(DISTINCT l_orderkey) AS win_count
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_suppkey, s_name) x
        |ORDER BY position""".stripMargin,
    "q7_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q8_time_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('%d:%06.3f', l_linenumber, l_quantity % 60) AS time_str,
        |  CAST(FLOOR((l_linenumber * 60 +
        |    CAST(string_split(printf('%d:%06.3f', l_linenumber, l_quantity % 60), ':')[2] AS DOUBLE)
        |  ) * 1000) AS BIGINT) AS time_ms
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q9_incremental" ->
      """SELECT user_id,
        |  COUNT(*) AS n_new,
        |  MIN(event_id) AS first_new_event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS new_value_total
        |FROM events e
        |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |  AND EXISTS (SELECT 1 FROM events o
        |              WHERE o.ts <= TIMESTAMP '2024-01-15 00:00:00'
        |                AND o.user_id = e.user_id)
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q10_sanitize" ->
      """SELECT p_partkey,
        |  CAST(LEAST(GREATEST(p_size, 5), 20) AS INT) AS size_clamped,
        |  UPPER(TRIM(p_brand)) AS brand_norm,
        |  COALESCE(NULLIF(TRIM(p_type), ''), 'unknown') AS type_norm,
        |  CAST(ROUND(p_retailprice, 0) AS BIGINT) AS price_rounded
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q11_sync_stats" ->
      """SELECT event_type, n, total_value, n_users,
        |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share
        |FROM (
        |  SELECT event_type,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |    COUNT(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY event_type) x
        |ORDER BY event_type""".stripMargin,
    "q12_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q13_order_revenue" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q18_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q19_hash_split" ->
      """SELECT CASE WHEN md5(CAST(o_orderkey AS VARCHAR)) < 'cccccccc000000000000000000000000'
        |            THEN 'train' ELSE 'eval' END AS split,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders
        |GROUP BY 1
        |ORDER BY split""".stripMargin,
    "q21_range_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
        |s AS (SELECT user_id, event_id AS signup_id, es AS start_es FROM ev WHERE event_type = 'signup'),
        |p AS (SELECT user_id, event_id AS purchase_id, es FROM ev WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT DISTINCT signup_id, purchase_id
        |  FROM s JOIN p USING (user_id)
        |  WHERE p.es >= s.start_es AND p.es < s.start_es + 3600)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases_matched,
        |  CAST(COUNT(DISTINCT signup_id) AS BIGINT) AS n_signups_matched
        |FROM j""".stripMargin,
    "q20_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
        |s1 AS (SELECT user_id, MIN(es) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT ev.user_id, MIN(es) AS t2 FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND es > t1 AND es <= t1 + 3600
        |  GROUP BY ev.user_id),
        |s3 AS (
        |  SELECT ev.user_id, MIN(es) AS t3 FROM ev JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND es > t2 AND es <= t2 + 3600
        |  GROUP BY ev.user_id)
        |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s2
        |UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
        |ORDER BY stage""".stripMargin,
    "q16_quantiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 6) AS p95,
        |  ROUND(MIN(value), 6) AS vmin,
        |  ROUND(MAX(value), 6) AS vmax
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q17_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items,
        |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q14_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
        |  COUNT(json_extract_string(props, '$.k')) AS n_with_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q15_asof_join" ->
      """WITH uniq AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
        |    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) x
        |  WHERE rn = 1)
        |SELECT a.o_custkey, a.o_orderkey,
        |  b.o_orderkey AS prev_orderkey,
        |  b.o_totalprice AS prev_totalprice
        |FROM orders a
        |ASOF LEFT JOIN uniq b
        |  ON a.o_custkey = b.o_custkey AND b.o_orderdate < a.o_orderdate
        |ORDER BY a.o_custkey, a.o_orderkey""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY content_hash""".stripMargin,
    "t1_langid" ->
      (s"WITH $langScoredCte\n" +
        s"""SELECT doc_id,
           |  $langCaseSql AS pred_lang,
           |  ($langCaseSql = lang) AS is_match
           |FROM scored
           |ORDER BY doc_id""".stripMargin),
    "t2_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_actual,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        |    ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / GREATEST(length(text), 1), 6) AS punct_ratio,
        |    ROUND(CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        x -> list_contains(['the','and','of','to','in','is','a','on','for','with'], x))) AS DOUBLE)
        |      / GREATEST(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1), 6) AS stop_ratio
        |  FROM documents)
        |SELECT doc_id, n_chars_actual, n_tokens, punct_ratio, stop_ratio,
        |  ROUND(0.5 * LEAST(n_tokens, 100) / 100.0
        |      + 0.3 * (1.0 - punct_ratio)
        |      + 0.2 * LEAST(stop_ratio * 5.0, 1.0), 6) AS quality_score
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "t3_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS subword_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "t5_vocab" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents) x
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,
    "t6_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> ''
        |  GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    ROUND(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id, rank, token, score FROM (
        |  SELECT doc_id, token, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rank
        |  FROM scored) x
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // the sketch is exact whenever distinct tokens <= capacity, so the
    // same oracle applies on this corpus (capacity 4096 >> vocabulary)
    "t5_vocab_sketch" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents) x
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,
    "s4_knn_graph" -> OracleReplicas.s4KnnGraph(),
    // empty-string tokens are COUNTED (t7's convention — the kernel sees
    // every array element), so no token <> '' filter here
    "t10_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token),
        |n AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS nt FROM tf GROUP BY doc_id),
        |agg AS (
        |  SELECT tf.doc_id,
        |    CAST(MAX(nt) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        |    -SUM((CAST(c AS DOUBLE) / nt) * ln(CAST(c AS DOUBLE) / nt)) AS h
        |  FROM tf JOIN n USING (doc_id) GROUP BY tf.doc_id)
        |SELECT doc_id, n_tokens, distinct_tokens,
        |  ROUND(h, 6) AS token_entropy,
        |  ROUND(CASE WHEN distinct_tokens > 1 THEN h / ln(distinct_tokens) ELSE 0.0 END, 6)
        |    AS norm_entropy
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    "t8_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> ''
        |  GROUP BY doc_id, token),
        |ctf AS (SELECT token, CAST(SUM(tf) AS DOUBLE) AS ctf FROM tf GROUP BY token),
        |tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM tf),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    SUM(tf * ln(ctf / n_total)) AS lp_sum
        |  FROM tf JOIN ctf USING (token) CROSS JOIN tot
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, ROUND(lp_sum / n_tokens, 6) AS avg_logprob
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    // t11: the full DSIR chain replayed — FNV unigram/bigram feature
    // hashes (chr(31) token separator, matching ShingleHashes), unsigned
    // mod-1024 buckets (= the JVM's signed pmod: power-of-two modulus),
    // add-1 smoothed target/raw distributions, per-doc Σ c·λ. The sum
    // groups by bucket where the operator sums per feature — identical
    // reals, reassociation absorbed by ROUND 6 (t8's precedent).
    "t11_dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT p.doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
         |  ROUND(SUM(c * lam), 6) AS log_weight
         |FROM perdoc p JOIN lam USING (b)
         |WHERE p.doc_id >= 50
         |GROUP BY p.doc_id
         |ORDER BY p.doc_id""".stripMargin,
    // t12: interpolated bigram LM replayed — zipped parallel unnests
    // build the adjacency pairs, term granularity matches the operator's
    // per-(doc, w1, w2) grouping exactly, λ=0.75 pinned
    "t12_bigram_logprob" ->
      (s"WITH $t12Ctes\n" +
        """SELECT doc_id, n_tokens, avg_logprob FROM t12
          |ORDER BY doc_id""".stripMargin),
    // dc15: two-level selection ≡ single window (k smallest md5 keys
    // per stratum either way), so the oracle is the plain window
    "dc15_stratified_sample" ->
      """SELECT lang, CAST(rn AS INT) AS rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) z
        |WHERE rn <= 25
        |ORDER BY lang, rn""".stripMargin,
    "q38_deciles" ->
      """SELECT o_orderpriority, CAST(decile AS INT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(MIN(o_totalprice), 2) AS lo,
        |  ROUND(MAX(o_totalprice), 2) AS hi,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    NTILE(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders) z
        |GROUP BY o_orderpriority, decile
        |ORDER BY o_orderpriority, decile""".stripMargin,
    // dc16: t1's replayed prediction rule feeding dc4's window machinery
    // with equal per-language weights
    "dc16_language_balance" ->
      (s"WITH $langScoredCte,\n" +
        s"""lg AS (SELECT doc_id, ws_tokens, $langCaseSql AS pred_lang FROM scored),
           |wt AS (SELECT pred_lang, 1.0 AS w FROM (SELECT DISTINCT pred_lang FROM lg) z),
           |b AS (
           |  SELECT pred_lang,
           |    CAST(FLOOR(12000.0 * w / (SELECT SUM(w) FROM wt)) AS BIGINT) AS lang_budget
           |  FROM wt),
           |s AS (
           |  SELECT doc_id, lg.pred_lang, ws_tokens, lang_budget,
           |    CAST(SUM(ws_tokens) OVER (PARTITION BY lg.pred_lang
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           |  FROM lg JOIN b USING (pred_lang))
           |SELECT doc_id, pred_lang, ws_tokens, cum_tokens, lang_budget FROM s
           |WHERE cum_tokens <= lang_budget
           |ORDER BY pred_lang, cum_tokens""".stripMargin),
    // q39: monthly DECIMAL revenue, lag over the calendar-bounded month
    // grain, delta stays DECIMAL, only the final ratio is floating point
    "q39_mom_revenue" ->
      """WITH m AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |d AS (SELECT yr, mo, rev, n_orders, LAG(rev) OVER (ORDER BY yr, mo) AS prev FROM m)
        |SELECT yr, mo, CAST(rev AS DOUBLE) AS revenue, n_orders,
        |  CAST(prev AS DOUBLE) AS prev_revenue,
        |  CASE WHEN prev IS NULL THEN NULL
        |       ELSE ROUND(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100, 4) END AS mom_pct
        |FROM d ORDER BY yr, mo""".stripMargin,
    // q40: the post-delete snapshot read IS the filtered corpus scan —
    // copy-on-write row deletion must lose exactly the range, nothing
    // else (directory identity is spec-asserted; content is gated here)
    "q40_delete_where" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id NOT BETWEEN 160 AND 240
        |ORDER BY doc_id""".stripMargin,
    // q41: restoring the pre-delete version must reproduce the FULL
    // corpus — the restored manifest names the original (immutable)
    // directories, so any divergence means restore resolved or
    // published the wrong state
    "q41_restore" ->
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // d14: plain levenshtein ≤ maxDist in the oracle equals the
    // operator's threshold-bounded variant's kept set exactly
    "d14_fuzzy_join" ->
      """WITH d AS (
        |  SELECT doc_id, substr(trim(lower(text)), 1, 80) AS p FROM documents),
        |b AS (SELECT doc_id, p, split_part(p, ' ', 1) AS blk FROM d)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  CAST(levenshtein(a.p, b2.p) AS INT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |WHERE levenshtein(a.p, b2.p) <= 10
        |ORDER BY doc_a, doc_b""".stripMargin,
    // t18: per-point terms rounded at 8 dp then DECIMAL-summed (exact,
    // order-free), so the closed-form OLS is engine-identical
    "t18_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token FROM documents),
        |tc AS (
        |  SELECT token, COUNT(*) AS n FROM tok WHERE token <> ''
        |  GROUP BY token ORDER BY n DESC, token LIMIT 1000),
        |pts0 AS (
        |  SELECT ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS DOUBLE)), 8) AS x,
        |         ROUND(ln(CAST(n AS DOUBLE)), 8) AS y
        |  FROM tc),
        |pts AS (
        |  SELECT x, y, ROUND(x * x, 8) AS xx, ROUND(x * y, 8) AS xy FROM pts0),
        |sums AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
        |    CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xx AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(xy AS DECIMAL(28,10))) AS DOUBLE) AS sxy
        |  FROM pts)
        |SELECT CAST(k AS BIGINT) AS n_types,
        |  ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope,
        |  ROUND((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 6) AS intercept
        |FROM sums""".stripMargin,
    // t19: ln factor rounded 8 dp, per-token term 10 dp, DECIMAL(28,12)
    // accumulation (the t18 discipline) — order-free both sides
    "t20_textrank" -> t20TextrankSql(iters = 5, topK = 30),
    "t19_kl_drift" ->
      """WITH st AS MATERIALIZED (
        |  SELECT source, token, COUNT(*) AS c_st FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |    FROM documents) z
        |  WHERE token <> '' GROUP BY source, token),
        |ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
        |ct AS (SELECT token, SUM(c_st) AS c_t FROM st GROUP BY token),
        |tot AS (SELECT SUM(c_st) AS n FROM st),
        |terms AS (
        |  SELECT st.source, n_s,
        |    ROUND((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)) *
        |      ROUND(ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE)) /
        |        (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))), 8), 10) AS term
        |  FROM st JOIN ns USING (source) JOIN ct USING (token) CROSS JOIN tot)
        |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl_divergence
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    // dc14: the threshold compares t12's already-rounded score; kept
    // scores sum as DECIMAL(18,6) so the mean is order-free both sides
    "dc14_perplexity_gate" ->
      (s"WITH $t12Ctes\n" +
        """SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(CASE WHEN avg_logprob >= -3.41 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  ROUND(SUM(CASE WHEN avg_logprob >= -3.41 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac,
          |  ROUND(CAST(SUM(CASE WHEN avg_logprob >= -3.41 THEN CAST(avg_logprob AS DECIMAL(18,6)) END) AS DOUBLE)
          |    / SUM(CASE WHEN avg_logprob >= -3.41 THEN 1 ELSE 0 END), 6) AS avg_kept_lp
          |FROM t12 JOIN documents d USING (doc_id)
          |GROUP BY d.source
          |ORDER BY d.source""".stripMargin),
    // t13: BPE merge rounds replayed as generated CTE chains (the
    // s2/s5 k-means precedent): per round, sliding pair counts, the
    // (n DESC, lhs, rhs) best pair, and the greedy leftmost
    // non-overlapping rewrite via run-grouped window parity
    "t13_bpe_merges" -> OracleReplicas.t13BpeMerges(),
    // t14: the t13 chain's final dict joined back to the corpus words
    "t14_bpe_encode" -> OracleReplicas.t14BpeEncode(),
    // t15: the CMS counter plane replayed (splitmix buckets, LEAST over
    // rows), probes shared with the operator's probe list
    "t15_cms_freq" -> OracleReplicas.t15CmsFreq(graft.operators.TextAnalysis.CmsProbes),
    // t16: PMI over the same zipped-unnest bigrams as t12, multiplication
    // order matched to the operator's left-associative expression
    "t16_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        |cu AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cu FROM tok GROUP BY w),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
        |big AS (
        |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) > 1),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count FROM big GROUP BY w1, w2),
        |nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nb FROM big)
        |SELECT w1, w2, pair_count,
        |  ROUND(ln((CAST(pair_count AS DOUBLE) * n.n * n.n) / (nb.nb * cu1.cu * cu2.cu)), 6) AS pmi
        |FROM cb
        |JOIN cu cu1 ON cb.w1 = cu1.w
        |JOIN cu cu2 ON cb.w2 = cu2.w
        |CROSS JOIN n CROSS JOIN nb
        |WHERE pair_count >= 5
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 30""".stripMargin,
    // dc11: t11's chain + the budget cut — per-token score rounded to 4
    // decimals (the deterministic cross-engine rank key), md5 tie-break,
    // global running token sum, keep while within budget
    "dc11_dsir_select" ->
      s"""WITH $dsirCtes,
         |sc AS (
         |  SELECT p.doc_id, ROUND(SUM(c * lam) / SUM(c), 4) AS score
         |  FROM perdoc p JOIN lam USING (b)
         |  WHERE p.doc_id >= 50
         |  GROUP BY p.doc_id),
         |tok AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
         |sel AS (
         |  SELECT sc.doc_id, n_tokens, score,
         |    SUM(n_tokens) OVER (
         |      ORDER BY score DESC, md5(CAST(sc.doc_id AS VARCHAR)), sc.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM sc JOIN tok USING (doc_id))
         |SELECT doc_id, n_tokens, score, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM sel
         |WHERE cum_tokens <= 20000
         |ORDER BY cum_tokens""".stripMargin,
    // the synthesized contact line (one email / phone / IPv4 per doc) is
    // replayed verbatim; regex syntax is the Java∩RE2 subset, redaction
    // order email → phone → IP matches the operator exactly
    "t9_pii_redact" -> {
      import graft.operators.TextAnalysis.{EmailRe, PhoneRe, Ipv4Re}
      s"""WITH synth AS (
         |  SELECT doc_id,
         |    'contact user' || doc_id || '@' || source || '.com or 555-' ||
         |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
         |    lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0') ||
         |    ' ip 10.0.' || (doc_id % 256) || '.' || (n_chars % 256) ||
         |    ' re: ' || text AS text
         |  FROM documents),
         |red AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
         |    CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |        '$PhoneRe', '<PHONE>', 'g'),
         |      '$Ipv4Re', '<IP>', 'g') AS redacted
         |  FROM synth)
         |SELECT doc_id, n_emails, n_phones, n_ips,
         |  CAST(length(redacted) AS BIGINT) AS redacted_len,
         |  md5(redacted) AS redacted_md5
         |FROM red
         |ORDER BY doc_id""".stripMargin
    },
    // q35: the round-trip law — unpivot(pivot(events)) must equal the
    // plain aggregation, so the oracle IS the plain aggregation
    "q35_unpivot" ->
      """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // q36: CUBE = all four grains; gid bit order matches Spark's
    // grouping_id() (first grouping column = high bit)
    "q36_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // q37: fences rounded to 6 dp BEFORE the comparison so both engines
    // classify boundary rows against the identical double
    "q37_outliers" ->
      """WITH f AS (
        |  SELECT event_type,
        |    ROUND(quantile_cont(value, 0.25), 6) AS q1,
        |    ROUND(quantile_cont(value, 0.75), 6) AS q3
        |  FROM events GROUP BY event_type),
        |f2 AS (
        |  SELECT event_type,
        |    ROUND(q1 - 1.5 * (q3 - q1), 6) AS lo_fence,
        |    ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi_fence
        |  FROM f)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN value < lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low,
        |  CAST(SUM(CASE WHEN value > hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high,
        |  lo_fence, hi_fence
        |FROM events e JOIN f2 USING (event_type)
        |GROUP BY e.event_type, lo_fence, hi_fence
        |ORDER BY event_type""".stripMargin,
    "q34_attribution" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM (
        |    SELECT event_id, user_id, ts,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') z
        |  WHERE rn = 1)
        |SELECT a.event_id, a.user_id,
        |  b.event_id AS click_id,
        |  CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS gap_us,
        |  CAST(ROUND(CAST(a.value AS DECIMAL(18,2)), 2) AS DOUBLE) AS value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN clicks b
        |  ON a.user_id = b.user_id AND b.ts < a.ts
        |ORDER BY a.event_id""".stripMargin,
    "q33_scd2" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w = event_type THEN 0 ELSE 1 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, ts, event_type,
        |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |  FROM m),
        |g AS (
        |  SELECT user_id, CAST(seq AS BIGINT) AS seq, event_type, MIN(ts) AS valid_from
        |  FROM r GROUP BY user_id, seq, event_type)
        |SELECT user_id, seq, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to
        |FROM g
        |ORDER BY user_id, seq""".stripMargin,
    "q32_moving_window" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS dsum, COUNT(*) AS dn
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day,
        |  CAST(SUM(dn) OVER w AS BIGINT) AS win_events,
        |  ROUND(CAST(SUM(dsum) OVER w AS DOUBLE), 2) AS win_value,
        |  ROUND(CAST(SUM(dsum) OVER w AS DOUBLE) / (SUM(dn) OVER w), 4) AS avg_per_event
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,
    "st1_stream_window" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "st2_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  COUNT(*) AS n_events,
        |  MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS start_epoch,
        |  MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) - MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS duration_sec
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // m3: char-domain replay of the thumbnail resample, band buckets,
    // and Hamming verify (Spark ascii ≡ DuckDB unicode per codepoint)
    "m3_binary_neardup" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 32),
        |      i -> unicode(substr(text, CAST((i * length(text)) // 32 AS INT) + 1, 1))) AS thumb
        |  FROM documents WHERE length(text) > 0),
        |banded AS (
        |  SELECT doc_id, thumb, z.b AS band, thumb[z.b * 8 + 1 : z.b * 8 + 8] AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) z),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |h AS (
        |  SELECT id_a, id_b,
        |    CAST(list_sum(list_transform(range(1, 33),
        |      i -> CASE WHEN sa.thumb[i] = sb.thumb[i] THEN 0 ELSE 1 END)) AS INT) AS hamming
        |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
        |SELECT id_a, id_b, hamming, hamming <= 4 AS is_near FROM h
        |ORDER BY id_a, id_b""".stripMargin,
    // q31: the maintained rollup must equal a full recompute — the
    // oracle IS the full recompute (counts, decimal sums, HLL registers
    // from every row)
    "q31_incremental_rollup" -> OracleReplicas.q31IncrementalRollup(),
    // q28: the Bloom prefilter is exactness-preserving (no false
    // negatives; the exact join kills false positives), so the oracle is
    // the PLAIN three-way join
    "q28_bloom_join" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey = 7
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 100""".stripMargin,
    // q29: the KMV estimate replayed exactly — distinct splitmix hashes
    // per group, unsigned order, k-th smallest, (k−1)·2^64 // h_k in
    // HUGEINT with the same Long.MaxValue clamp
    "q29_kmv_distinct" ->
      s"""WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ${OracleReplicas.splitmixSql("CAST(user_id AS HUGEINT)")} AS hu
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, hu,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hu) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h),
        |sel AS (
        |  SELECT event_type, MAX(CASE WHEN rn = 256 THEN hu END) AS hk, MAX(nd) AS nd
        |  FROM ranked WHERE rn <= 256 GROUP BY event_type),
        |n AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type)
        |SELECT s.event_type,
        |  CAST(CASE WHEN s.nd < 256 THEN s.nd
        |       ELSE LEAST(255 * CAST(18446744073709551616 AS HUGEINT) // s.hk,
        |                  CAST(9223372036854775807 AS HUGEINT)) END AS BIGINT) AS est_users,
        |  n_events
        |FROM sel s JOIN n USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q30: the KMV intersection estimator replayed — per pair of event
    // types, bottom-k of the sketch union (≡ bottom-k of A∪B), members
    // present in both sketches, same union estimate and the same fixed
    // (inter · est_union) / held double op order
    "q30_kmv_overlap" ->
      s"""WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ${OracleReplicas.splitmixSql("CAST(user_id AS HUGEINT)")} AS hu
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, hu,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hu) AS rn
        |  FROM h),
        |sk AS (SELECT event_type, hu FROM ranked WHERE rn <= 256),
        |types AS (SELECT DISTINCT event_type FROM events),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM types a JOIN types b ON a.event_type < b.event_type),
        |uhash AS (
        |  SELECT p.ta, p.tb, s.hu
        |  FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
        |  GROUP BY p.ta, p.tb, s.hu),
        |u AS (
        |  SELECT ta, tb, hu,
        |    ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hu) AS rn
        |  FROM uhash QUALIFY rn <= 256),
        |ustat AS (SELECT ta, tb, COUNT(*) AS held, MAX(hu) AS hk FROM u GROUP BY ta, tb),
        |inter AS (
        |  SELECT u.ta, u.tb, COUNT(*) AS cnt
        |  FROM u
        |  JOIN sk sa ON sa.event_type = u.ta AND sa.hu = u.hu
        |  JOIN sk sb ON sb.event_type = u.tb AND sb.hu = u.hu
        |  GROUP BY u.ta, u.tb),
        |est AS (
        |  SELECT ta, tb, held,
        |    CAST(CASE WHEN held < 256 THEN held
        |         ELSE LEAST(255 * CAST(18446744073709551616 AS HUGEINT) // hk,
        |                    CAST(9223372036854775807 AS HUGEINT)) END AS BIGINT) AS est_union
        |  FROM ustat)
        |SELECT e.ta AS type_a, e.tb AS type_b,
        |  CAST(COALESCE(i.cnt, 0) AS INT) AS inter_k,
        |  e.est_union,
        |  ROUND(CAST(COALESCE(i.cnt, 0) AS DOUBLE) * CAST(e.est_union AS DOUBLE) / e.held,
        |        4) AS est_shared
        |FROM est e LEFT JOIN inter i ON i.ta = e.ta AND i.tb = e.tb
        |ORDER BY type_a, type_b""".stripMargin,
    "g1_pagerank" -> g1PagerankSql(iters = 5, topK = 100),
    "g4_components" -> g4ComponentsSql(iters = G4OracleIters),
    "g5_personalized_pagerank" -> g5PersonalizedSql(iters = 4, topK = 50),
    "g6_hop_distance" -> g6HopSql(maxHops = 6),
    "g7_label_communities" -> g7CommunitiesSql(rounds = 4),
    "g9_weighted_pagerank" -> g9WeightedPagerankSql(iters = 5, topK = 100),
    "t17_bm25" -> t17Bm25Sql,
    // t21/t22 probe the PERSISTED BPE dict / BM25 inverted index;
    // declared contract is output-identity with t14 / t17, so each
    // shares its in-job twin's oracle (the d16/d17/s10 pattern)
    "t21_bpe_store_probe" -> OracleReplicas.t14BpeEncode(),
    "t22_bm25_store_probe" -> t17Bm25Sql,
    // t23 queries base ∪ appended segment; the additive-merge contract
    // makes it bit-identical to a one-shot full-corpus build, so it
    // shares t17's SQL verbatim (the d16/d17/s10/t21/t22 pattern)
    "t23_bm25_append_probe" -> t17Bm25Sql,
    // s7: both legs rank with deterministic (rounded score, id) order;
    // rrf = sum of per-leg 1/(60+r) terms rounded at 8 dp — ranks are
    // integers, so the fusion is engine-exact
    "s7_hybrid_rrf" ->
      (s"WITH ${bm25Ctes(graft.operators.TextAnalysis.Bm25QueryTerms)},\n" +
        """tr AS (
          |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS r_text
          |  FROM bm WHERE doc_id <> 0),
          |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          |pr AS (
          |  SELECT vec_id AS doc_id, unnest(qe) AS x, unnest(embedding) AS y
          |  FROM qv CROSS JOIN embeddings WHERE vec_id <> 0),
          |scv AS (
          |  SELECT doc_id, SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
          |    SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
          |    SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
          |  FROM pr GROUP BY doc_id),
          |vr AS (
          |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY
          |    ROUND(CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dot / sqrt(na * nb) END, 6) DESC,
          |    doc_id) AS INT) AS r_vec
          |  FROM scv),
          |fused AS (
          |  SELECT COALESCE(vr.doc_id, tr.doc_id) AS doc_id,
          |    COALESCE(ROUND(1.0 / (60 + r_vec), 8), 0.0)
          |      + COALESCE(ROUND(1.0 / (60 + r_text), 8), 0.0) AS rrf,
          |    r_vec, r_text
          |  FROM vr FULL OUTER JOIN tr ON vr.doc_id = tr.doc_id)
          |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank,
          |  doc_id, rrf, r_vec, r_text
          |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin),
    "g2_triangle_count" ->
      s"""WITH $graphCtes,
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.src ELSE u.dst END AS lo,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.dst ELSE u.src END AS hi
        |  FROM und u JOIN deg d1 ON d1.src = u.src JOIN deg d2 ON d2.src = u.dst),
        |wedge AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |tri AS (
        |  SELECT u, v, w FROM wedge
        |  JOIN (SELECT LEAST(lo, hi) AS v, GREATEST(lo, hi) AS w FROM o) c USING (v, w))
        |SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM (SELECT unnest([u, v, w]) AS part_key FROM tri) z
        |GROUP BY part_key
        |ORDER BY part_key""".stripMargin,
    // g10: g2's degree-ordered wedge chain replayed on the md5-coin
    // sampled subgraph (q19's hash-split literal), degrees recomputed on
    // the SAMPLE, estimate scaled by keepDen³ (default 1/4 → ×64)
    "g10_triangle_sample" ->
      s"""WITH $graphCtes,
        |samp AS (
        |  SELECT src, dst FROM und
        |  WHERE md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR))
        |        < '40000000000000000000000000000000'),
        |sedges AS (SELECT src, dst FROM samp UNION ALL SELECT dst, src FROM samp),
        |sdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sedges GROUP BY src),
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.src ELSE u.dst END AS lo,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.dst ELSE u.src END AS hi
        |  FROM samp u JOIN sdeg d1 ON d1.src = u.src JOIN sdeg d2 ON d2.src = u.dst),
        |wedge AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |tri AS (
        |  SELECT u, v, w FROM wedge
        |  JOIN (SELECT LEAST(lo, hi) AS v, GREATEST(lo, hi) AS w FROM o) c USING (v, w))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM samp) AS n_edges_sampled,
        |       CAST(COUNT(*) AS BIGINT) AS n_tri_sampled,
        |       CAST(COUNT(*) * 64 AS BIGINT) AS est_triangles
        |FROM tri""".stripMargin,
    // g8: g2's triangle chain + the degree table, coefficient computed
    // with the identical left-associative 2.0·n/(deg·(deg−1)) shape
    "g8_clustering_coeff" ->
      s"""WITH $graphCtes,
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.src ELSE u.dst END AS lo,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.dst ELSE u.src END AS hi
        |  FROM und u JOIN deg d1 ON d1.src = u.src JOIN deg d2 ON d2.src = u.dst),
        |wedge AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |tri AS (
        |  SELECT u, v, w FROM wedge
        |  JOIN (SELECT LEAST(lo, hi) AS v, GREATEST(lo, hi) AS w FROM o) c USING (v, w)),
        |tc AS (
        |  SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n_tri
        |  FROM (SELECT unnest([u, v, w]) AS part_key FROM tri) z
        |  GROUP BY part_key)
        |SELECT d.src AS part_key, d.deg, COALESCE(tc.n_tri, 0) AS n_tri,
        |  ROUND(2.0 * COALESCE(tc.n_tri, 0) / (d.deg * (d.deg - 1)), 6) AS clustering_coeff
        |FROM deg d LEFT JOIN tc ON tc.part_key = d.src
        |WHERE d.deg >= 2
        |ORDER BY part_key""".stripMargin,
    // m5: m3's replayed char-domain thumbnail as a string signature key,
    // keep-min-id per identical representation
    "m5_thumb_dedup" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, substr(text, 1, 1) || '~' || substr(text, 3)
        |  FROM documents WHERE doc_id < 50 AND length(text) > 64),
        |sig AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, 32),
        |      i -> CAST(unicode(substr(text, CAST((i * length(text)) // 32 AS INT) + 1, 1)) AS VARCHAR)), ',') AS tk
        |  FROM aug WHERE length(text) > 0),
        |k AS (
        |  SELECT tk, MIN(doc_id) AS dup_of, CAST(COUNT(*) AS BIGINT) AS n_copies
        |  FROM sig GROUP BY tk)
        |SELECT s.doc_id, k.dup_of, k.n_copies
        |FROM sig s JOIN k USING (tk)
        |WHERE s.doc_id <> k.dup_of
        |ORDER BY doc_id""".stripMargin,
    "g3_edge_embeddedness" ->
      s"""WITH $graphCtes,
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.src ELSE u.dst END AS lo,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.src < u.dst)
        |              THEN u.dst ELSE u.src END AS hi
        |  FROM und u JOIN deg d1 ON d1.src = u.src JOIN deg d2 ON d2.src = u.dst),
        |wedge AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |tri AS (
        |  SELECT u, v, w FROM wedge
        |  JOIN (SELECT LEAST(lo, hi) AS v, GREATEST(lo, hi) AS w FROM o) c USING (v, w)),
        |ed3 AS (
        |  SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM tri
        |  UNION ALL SELECT LEAST(u, w), GREATEST(u, w) FROM tri
        |  UNION ALL SELECT LEAST(v, w), GREATEST(v, w) FROM tri)
        |SELECT a AS src, b AS dst, CAST(COUNT(*) AS BIGINT) AS n_common
        |FROM ed3 GROUP BY a, b
        |ORDER BY n_common DESC, src, dst
        |LIMIT 100""".stripMargin,
  )

  /** Shared CTE body for the graph oracles (g1/g2): the co-purchase
    * edge list exactly as [[graft.operators.Graph.copurchaseEdges]]
    * builds it, its symmetric closure, and per-node degrees.
    */
  private val graphCtes: String =
    """op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |und AS (
      |  SELECT DISTINCT a.pk AS src, b.pk AS dst
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
      |edges AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)""".stripMargin

  /** g1's oracle: the integer PageRank loop replayed as a generated CTE
    * chain (one CTE per iteration — linear references, safe to inline),
    * mirroring [[graft.operators.Graph.pagerank]]'s exact floor-division
    * arithmetic (`//` ≡ Spark `div` on the all-positive ranks).
    */
  /** t20's oracle: g1's replayed integer-PageRank chain over the word
    * co-occurrence graph — lexical-pair dedup BEFORE hashing (matching
    * the operator), word ids = the signed k=1 FNV shingle hash (t11's
    * unigram feature domain), ranks in exact micro-units.
    */
  private def t20TextrankSql(iters: Int, topK: Int): String = {
    import graft.operators.Graph.{Damping, Teleport, Rank0}
    def wid(e: String) = signed64(fnv64Sql(s"$e || chr(31)"))
    val rounds = (1 to iters).map { i =>
      s"""tr$i AS (
         |  SELECT e.dst AS node,
         |    CAST($Teleport + SUM(($Damping * (r.pr // d.deg)) // 100) AS BIGINT) AS pr
         |  FROM tr${i - 1} r
         |  JOIN tdeg d ON d.src = r.node
         |  JOIN tedges e ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH toksr AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |adjr AS (
       |  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
       |  FROM toksr WHERE len(t) > 1),
       |undw AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(w1, w2) AS wa, GREATEST(w1, w2) AS wb
       |  FROM adjr WHERE w1 <> '' AND w2 <> '' AND w1 <> w2),
       |tund AS MATERIALIZED (SELECT ${wid("wa")} AS src, ${wid("wb")} AS dst FROM undw),
       |tedges AS MATERIALIZED (SELECT src, dst FROM tund UNION ALL SELECT dst, src FROM tund),
       |tdeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM tedges GROUP BY src),
       |twords AS (
       |  SELECT DISTINCT ${wid("w")} AS part_key, w FROM (
       |    SELECT wa AS w FROM undw UNION ALL SELECT wb FROM undw) z),
       |tr0 AS (SELECT src AS node, CAST($Rank0 AS BIGINT) AS pr FROM tdeg),
       |$rounds,
       |top AS (
       |  SELECT r.node AS part_key, d.deg, r.pr AS rnk
       |  FROM tr$iters r JOIN tdeg d ON d.src = r.node
       |  ORDER BY r.pr DESC, part_key
       |  LIMIT $topK)
       |SELECT w.w AS word, t.deg, t.rnk AS "rank"
       |FROM top t JOIN twords w USING (part_key)
       |ORDER BY "rank" DESC, word""".stripMargin
  }

  /** g9's oracle: g1's replayed chain with mass split by edge weight —
    * `(Damping · ((pr · w) // wdeg)) // 100`, Long-exact like g1.
    */
  private def g9WeightedPagerankSql(iters: Int, topK: Int): String = {
    import graft.operators.Graph.{Damping, Teleport, Rank0}
    val rounds = (1 to iters).map { i =>
      s"""wr$i AS (
         |  SELECT e.dst AS node,
         |    CAST($Teleport + SUM(($Damping * ((r.pr * e.w) // d.wdeg)) // 100) AS BIGINT) AS pr
         |  FROM wr${i - 1} r
         |  JOIN wdeg d ON d.src = r.node
         |  JOIN wedges e ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH wop AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |wund AS (
       |  SELECT a.pk AS src, b.pk AS dst, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM wop a JOIN wop b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY a.pk, b.pk),
       |wedges AS MATERIALIZED (
       |  SELECT src, dst, w FROM wund UNION ALL SELECT dst, src, w FROM wund),
       |wdeg AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM wedges GROUP BY src),
       |wr0 AS (SELECT src AS node, CAST($Rank0 AS BIGINT) AS pr FROM wdeg),
       |$rounds
       |SELECT r.node AS part_key, d.wdeg, r.pr AS "rank"
       |FROM wr$iters r JOIN wdeg d ON d.src = r.node
       |ORDER BY r.pr DESC, part_key
       |LIMIT $topK""".stripMargin
  }

  private def g1PagerankSql(iters: Int, topK: Int): String = {
    import graft.operators.Graph.{Damping, Teleport, Rank0}
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    CAST($Teleport + SUM(($Damping * (r.pr // d.deg)) // 100) AS BIGINT) AS pr
         |  FROM r${i - 1} r
         |  JOIN deg d ON d.src = r.node
         |  JOIN edges e ON e.src = r.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |r0 AS (SELECT src AS node, CAST($Rank0 AS BIGINT) AS pr FROM deg),
       |$rounds
       |SELECT r.node AS part_key, d.deg, r.pr AS "rank"
       |FROM r$iters r JOIN deg d ON d.src = r.node
       |ORDER BY r.pr DESC, part_key
       |LIMIT $topK""".stripMargin
  }

  /** Shared t12/dc14 CTE body: the Jelinek–Mercer interpolated bigram
    * LM replica ending in `t12(doc_id, n_tokens, avg_logprob)` — the
    * per-doc score already ROUNDED at 6 dp, so every downstream
    * comparison (dc14's threshold) operates on the same hash-verified
    * doubles in both engines.
    */
  private val t12Ctes: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
      |cu AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cu FROM tok GROUP BY w),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok),
      |big AS (
      |  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      |  FROM toks WHERE len(t) > 1),
      |tfb AS (SELECT doc_id, w1, w2, COUNT(*) AS tfb FROM big GROUP BY doc_id, w1, w2),
      |cb AS (SELECT w1, w2, CAST(SUM(tfb) AS DOUBLE) AS cb FROM tfb GROUP BY w1, w2),
      |terms AS (
      |  SELECT f.doc_id, ln(cu.cu / n.n) AS term
      |  FROM (SELECT doc_id, t[1] AS w FROM toks) f JOIN cu USING (w) CROSS JOIN n
      |  UNION ALL
      |  SELECT tfb.doc_id,
      |    tfb * ln(0.75 * cb.cb / cu1.cu + 0.25 * cu2.cu / n.n) AS term
      |  FROM tfb
      |  JOIN cb USING (w1, w2)
      |  JOIN cu cu1 ON tfb.w1 = cu1.w
      |  JOIN cu cu2 ON tfb.w2 = cu2.w
      |  CROSS JOIN n),
      |nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
      |t12 AS (
      |  SELECT doc_id, n_tokens, ROUND(SUM(term) / n_tokens, 6) AS avg_logprob
      |  FROM terms JOIN nt USING (doc_id)
      |  GROUP BY doc_id, n_tokens)""".stripMargin

  /** Shared t17/s7 BM25 CTE body: token arrays, per-(doc, term) tf via
    * list_filter (mirroring the Spark side's map-side array kernel —
    * the corpus is never exploded to a token table), per-term df, and
    * the per-doc BM25 sum with per-term scores rounded at 6 dp before
    * the sum (the cross-engine ulp guard). `k1 + 1` is written as the
    * same two-literal addition both engines fold identically.
    */
  /** t17's oracle — shared verbatim by t22's persisted-index probe
    * (output-identity contract, the d16 pattern).
    */
  private lazy val t17Bm25Sql: String =
    s"WITH ${bm25Ctes(graft.operators.TextAnalysis.Bm25QueryTerms)}\n" +
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
        |  doc_id, score
        |FROM bm ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  private def bm25Ctes(terms: Seq[String]): String = {
    val vals = terms.map(t => s"('$t')").mkString(", ")
    val (k1, b) = (graft.operators.TextAnalysis.Bm25K1, graft.operators.TextAnalysis.Bm25B)
    s"""toksb AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents),
       |db AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, t FROM toksb),
       |statsb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) / COUNT(*) AS avgdl FROM db),
       |qb(term) AS (VALUES $vals),
       |tfb25 AS (
       |  SELECT doc_id, dl, term, CAST(len(list_filter(t, x -> x = term)) AS DOUBLE) AS tf
       |  FROM db CROSS JOIN qb),
       |posb AS (SELECT * FROM tfb25 WHERE tf > 0),
       |dfb AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM posb GROUP BY term),
       |bm AS (
       |  SELECT doc_id, ROUND(SUM(ROUND(
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * ($k1 + 1.0)) /
       |    (tf + $k1 * (1.0 - $b + $b * dl / avgdl)), 6)), 6) AS score
       |  FROM posb JOIN dfb USING (term) CROSS JOIN statsb GROUP BY doc_id)""".stripMargin
  }

  /** g5's oracle: the personalized loop replayed exactly — seeded r0,
    * per-round neighbor contributions (g1's floor arithmetic) UNION ALL
    * the seed's teleport row, node-keyed sum. The seed is the hub
    * (highest degree, lowest id), resolved inside the query.
    */
  private def g5PersonalizedSql(iters: Int, topK: Int): String = {
    import graft.operators.Graph.{Damping, Teleport, Rank0}
    val rounds = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT node, CAST(SUM(pr) AS BIGINT) AS pr FROM (
         |    SELECT e.dst AS node,
         |      CAST(SUM(($Damping * (r.pr // d.deg)) // 100) AS BIGINT) AS pr
         |    FROM r${i - 1} r
         |    JOIN deg d ON d.src = r.node
         |    JOIN edges e ON e.src = r.node
         |    GROUP BY e.dst
         |    UNION ALL
         |    SELECT node, CAST($Teleport AS BIGINT) FROM seed) z
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |seed AS MATERIALIZED (SELECT src AS node FROM deg ORDER BY deg DESC, src LIMIT 1),
       |r0 AS (SELECT node, CAST($Rank0 AS BIGINT) AS pr FROM seed),
       |$rounds
       |SELECT r.node AS part_key, d.deg, r.pr AS "rank"
       |FROM r$iters r JOIN deg d ON d.src = r.node
       |WHERE r.pr > 0
       |ORDER BY r.pr DESC, part_key
       |LIMIT $topK""".stripMargin
  }

  /** g6's oracle: the bounded-BFS relaxation replayed round for round —
    * fixed `maxHops` rounds by CONTRACT (identical in both engines, no
    * convergence detection), each one neighbor join + node-keyed min.
    */
  /** t1's stopword-vote CTE + prediction CASE, shared by the t1 oracle
    * and dc16's language-balanced sampler so the replayed rule exists
    * exactly once (lists mirror `TextAnalysis.Stopwords`).
    */
  private val langScoredCte: String =
    """scored AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS ws_tokens,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        x -> list_contains(['der','die','und','das','ist','ein','den','von','zu','mit'], x))) AS s_de,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        x -> list_contains(['the','and','of','to','in','is','a','on','for','with'], x))) AS s_en,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        x -> list_contains(['el','la','de','que','y','en','los','del','las','un'], x))) AS s_es,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        x -> list_contains(['le','la','de','et','les','des','un','une','du','est'], x))) AS s_fr
      |  FROM documents)""".stripMargin

  private val langCaseSql: String =
    """CASE
      |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
      |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
      |    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      |    WHEN s_fr > 0 THEN 'fr'
      |    ELSE 'und' END""".stripMargin

  /** g7's oracle: the fixed-round synchronous label propagation
    * replayed as a generated CTE chain (one (count, argmax) pair per
    * round), mirroring [[graft.operators.Graph.labelCommunities]] —
    * neighbor-label frequency vote, ties to the smallest label, seed
    * labels = node ids. Fixed rounds both sides ⇒ equality by
    * construction (the g6 contract). CTEs are MATERIALIZED: each
    * generation is referenced by both the count and the next round.
    */
  private def g7CommunitiesSql(rounds: Int): String = {
    val gens = (1 to rounds).map { i =>
      s"""lc$i AS MATERIALIZED (
         |  SELECT e.src AS node, l.label, COUNT(*) AS c
         |  FROM edges e JOIN lp${i - 1} l ON l.node = e.dst
         |  GROUP BY e.src, l.label),
         |lp$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
         |    FROM lc$i) z
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |verts AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |lp0 AS MATERIALIZED (SELECT node, node AS label FROM verts),
       |$gens,
       |sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
       |          FROM lp$rounds GROUP BY label)
       |SELECT l.node AS part_key, l.label AS community_id, s.community_size
       |FROM lp$rounds l JOIN sizes s USING (label)
       |ORDER BY community_id, part_key""".stripMargin
  }

  private def g6HopSql(maxHops: Int): String = {
    val rounds = (1 to maxHops).map { i =>
      s"""h$i AS MATERIALIZED (
         |  SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM (
         |    SELECT e.dst AS node, h.hops + 1 AS hops
         |    FROM h${i - 1} h JOIN edges e ON e.src = h.node
         |    UNION ALL
         |    SELECT node, hops FROM h${i - 1}) z
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |seed AS MATERIALIZED (SELECT src AS node FROM deg ORDER BY deg DESC, src LIMIT 1),
       |h0 AS (SELECT node, CAST(0 AS BIGINT) AS hops FROM seed),
       |$rounds
       |SELECT node, hops FROM h$maxHops
       |ORDER BY hops, node""".stripMargin
  }

  /** g4's oracle-replay round budget — ONE constant shared by the query
    * (which asserts the propagation converged within it, see
    * `Graph.componentsFromEdges`) and the generated CTE chain below, so
    * the two can never silently drift. Aliases the d6-family chains'
    * budget: every min-label oracle replay in the gate uses the same
    * generation count.
    */
  private val G4OracleIters = OracleReplicas.PointerJumpIters

  /** g4's oracle: min-label propagation WITH pointer jumping replayed
    * as a generated CTE chain (one generation per round), mirroring the
    * Spark side's propagation round (`Dedup.propagationRound`) exactly:
    * each node's next label is the MIN over its own label, its
    * neighbors' labels, and the previous generation's label of its
    * label (the pointer jump — labels are node ids, so the map covers
    * every key and the inner joins drop nothing). Both engines iterate
    * to the same unique fixpoint (the true per-component min); jumping
    * covers ≥2^iters hops, so `iters`=10 handles any component diameter
    * ≤ 1024 — far beyond the co-purchase graph's. A naive reachability
    * closure (d6's walk CTE) is V×V rows on this near-complete graph —
    * measured 108 s at sf0.01, vs well under a second for the jumping
    * chain. CTEs are MATERIALIZED: each generation is referenced three
    * times, and DuckDB's default inlining would re-expand the chain
    * 3^iters-fold (the t13 lesson).
    */
  private def g4ComponentsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT dst AS node, MIN(cand) AS label FROM (
         |    SELECT e.src AS dst, l.label AS cand
         |    FROM edges e JOIN l${i - 1} l ON l.node = e.dst
         |    UNION ALL
         |    SELECT l.node AS dst, j.label AS cand
         |    FROM l${i - 1} l JOIN l${i - 1} j ON j.node = l.label
         |    UNION ALL
         |    SELECT node AS dst, label AS cand FROM l${i - 1}
         |  ) GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |verts AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |l0 AS MATERIALIZED (SELECT node, node AS label FROM verts),
       |$rounds,
       |allnodes AS (SELECT DISTINCT l_partkey AS node FROM lineitem)
       |SELECT a.node, COALESCE(l.label, a.node) AS component_id
       |FROM allnodes a LEFT JOIN l$iters l ON l.node = a.node
       |ORDER BY component_id, a.node""".stripMargin
  }
}
