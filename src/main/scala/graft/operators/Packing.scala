package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** Training-sequence assembly: pack the curated corpus into fixed
  * token-budget training sequences (the GPT-style concatenate-and-chunk
  * scheme every LM pre-training run performs after curation).
  *
  * Documents are deterministically sharded (first md5 hex digit of
  * `doc_id` → 16 shards), ordered within their shard by md5 priority
  * (dc2/dc4's reproducible-order idiom — no `rand()`, so reruns, engines
  * and audits agree on the exact layout), then concatenated; sequences of
  * exactly `budget` tokens are carved from each shard's token stream. A
  * document whose tokens straddle a sequence boundary spans both — the
  * standard causal-LM packing trade (no padding waste, some cross-doc
  * attention), and [[packStats]] reports exactly how much of it happened.
  *
  * Scale shape: ONE documents scan computes (doc_id, ws_tokens, priority)
  * map-side and drops the text — the window shuffles ~50 bytes/doc, never
  * the document body. The running-offset window is (shard)-keyed, so the
  * sort is per-shard (N/shards compact rows each); production runs scale
  * shards with the corpus (more md5 hex chars), keeping every partition
  * bounded — the same argument as dc2's per-source windows. `budget` is a
  * power of two so offset→sequence division is exact in any engine.
  *
  * Reference anchor: the reference's loaders insert in deterministic
  * dependency order (`/root/reference/main.py:61-128`); packing is the
  * training-data analogue — a reproducible total order over the corpus,
  * materialized as consumable fixed-size units.
  */
object Packing {

  val DefaultBudget: Long = 512L
  private val HexDigits = "0123456789abcdef"

  private[graft] def requirePow2(budget: Long): Unit =
    require(budget > 0 && (budget & (budget - 1)) == 0,
      s"budget=$budget must be a positive power of two (exact division in every engine)")

  /** Map-side (doc_id, ws_tokens, pri, shard) prep — the SAME projection
    * for the batch packer and the streaming twin
    * ([[graft.streaming.DocPipelines.sequencePackStream]]) so the
    * shard/priority formulas cannot drift between the two ingest paths.
    */
  private[graft] def shardedTokenCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(ws_tokens(col("text"))).cast("long").as("ws_tokens"),
        md5(col("doc_id").cast("string")).as("pri"))
      .filter(col("ws_tokens") > 0)
      .withColumn("shard", conv(substring(col("pri"), 1, 1), 16, 10).cast("int"))

  /** Per-doc packed layout: shard, token offsets, and the sequence range
    * [seq_first, seq_last] the document lands in. Shared by [[sequencePack]]
    * (p1) and [[packStats]] (p2) so the stats audit EXACTLY the layout the
    * packer ships.
    */
  private[operators] def packedDocs(t: Tables, budget: Long): DataFrame = {
    requirePow2(budget)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shardedTokenCounts(t.documents)
      .withColumn("start_tok", sum(col("ws_tokens")).over(w) - col("ws_tokens"))
      .withColumn("end_tok", col("start_tok") + col("ws_tokens"))
      .withColumn("seq_first", expr(s"start_tok div $budget"))
      .withColumn("seq_last", expr(s"(end_tok - 1) div $budget"))
  }

  /** p1: the pack manifest — one row per document: its shard, token
    * offset in the shard's concatenated stream, and the sequence range it
    * occupies. This IS the training-data layout: a writer materializes
    * sequence `s` of shard `h` by concatenating the manifest's docs with
    * `seq_first <= s <= seq_last` in `start_tok` order.
    */
  def sequencePack(t: Tables, budget: Long = DefaultBudget): DataFrame =
    packedDocs(t, budget)
      .select(col("doc_id"), col("shard"), col("ws_tokens"), col("start_tok"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + 1L).as("n_seqs"))
      .orderBy(col("shard"), col("start_tok"))

  /** p2: per-sequence fill/fragmentation stats — docs per sequence, token
    * fill (== budget except each shard's ragged tail), and how many of
    * its docs cross a sequence boundary (the cross-doc-attention count).
    * The numbers a run reports before training starts: fill ratio says
    * whether packing wasted budget; spanning counts say how much document
    * truncation/bleed the epoch will see.
    *
    * Scale shape: each doc explodes to its `n_seqs` sequence memberships
    * (~tokens/budget + 1 rows — bounded by doc length, not corpus size);
    * the aggregate shuffles (shard, seq_id) keyed scalar rows with
    * map-side partials. Text is long gone.
    */
  /** p3: deterministic epoch-order interleave — stride scheduling over
    * the mixture's sources. Doc #r of source s (md5-priority order, the
    * dc2/dc4 reproducible-order idiom) is scheduled at key (r − 0.5)/w_s,
    * so ascending key order interleaves sources proportionally to their
    * weights at EVERY prefix — the data-blending schedule an LM trainer
    * actually consumes after dc4 fixes the mixture (Megatron/Gopher-style
    * weighted blending, as a reproducible total order). Default weight
    * shares dc4's convention so mixture and schedule agree; like dc4, a
    * null/non-positive weight fails loudly (a silent null key would sort
    * a whole source to the front).
    *
    * Scale shape: only (doc_id, source) leaves the scan; the per-source
    * rank is a (source)-keyed window over compact rows; the global
    * position uses [[Ranking.globalRowNumber]] — range partitioning +
    * per-partition numbering, NO single-task global window. Keys are
    * exact-IEEE doubles of small integers, so engines agree bit-for-bit.
    */
  def epochInterleave(t: Tables,
      weight: Column = expr("try_cast(substr(source, 4) as int)") % 3 + 1): DataFrame = {
    val docs = t.documents.select(col("doc_id"), col("source"))
    val weights = docs.select(col("source")).distinct()
      .withColumn("w", weight.cast("double"))
      .withColumn("w",
        when(col("w").isNull || isnan(col("w")) || col("w") <= 0d,
          raise_error(concat(
            lit("p3 interleave weight must be a positive number; source '"),
            col("source"), lit("' evaluated to "),
            coalesce(col("w").cast("string"), lit("NULL")))))
          .otherwise(col("w")))
    val wWin = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val keyed = docs
      .withColumn("src_rank", row_number().over(wWin).cast("long"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("k", (col("src_rank").cast("double") - lit(0.5)) / col("w"))
    Ranking.globalRowNumber(keyed, Seq(col("k"), col("source"), col("doc_id")), "global_pos")
      .select(col("global_pos"), col("doc_id"), col("source"), col("src_rank"))
      .orderBy(col("global_pos"))
  }

  def packStats(t: Tables, budget: Long = DefaultBudget): DataFrame =
    packedDocs(t, budget)
      .select(col("shard"), col("start_tok"), col("end_tok"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .withColumn("seq_lo", col("seq_id") * budget)
      .withColumn("seq_hi", (col("seq_id") + 1L) * budget)
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("end_tok"), col("seq_hi")) - greatest(col("start_tok"), col("seq_lo")))
          .as("fill_tokens"),
        sum((col("start_tok") < col("seq_lo") || col("end_tok") > col("seq_hi"))
          .cast("long")).as("n_spanning"))
      .withColumn("fill_frac", round(col("fill_tokens").cast("double") / budget, 6))
      .orderBy(col("shard"), col("seq_id"))

  /** p5: per-SHARD manifest — the integrity record a shard writer
    * emits next to the data (the WebDataset/StreamingDataset index
    * pattern): doc and token counts, the sequence count the shard
    * materializes under p1's layout, the ragged tail's fill, and an
    * ORDER-FREE content checksum — the DECIMAL sum of each member
    * doc's 60-bit md5 prefix, exact and mergeable, so per-file partial
    * manifests roll up to the shard manifest without a rescan, and a
    * lost, duplicated or foreign doc changes the value. The checksum
    * column is EMITTED as its decimal-digit STRING: the sum exceeds
    * float64's 2^53 exact-integer range, so any consumer that
    * canonicalizes numerics through doubles would silently corrupt a
    * DECIMAL representation — a digit string survives every
    * serialization boundary bit-for-bit (parse back to a big integer
    * to merge partials). Downstream
    * loaders verify a shard against its manifest before training
    * starts; a resumed or re-run writer must reproduce it bit-for-bit.
    *
    * Scale shape: one map-side projection (token count + md5 — the
    * SAME `shardedTokenCounts` prep as p1, so the manifest audits
    * exactly the layout the packer ships), one shard-count-row
    * aggregation with map-side partials; text never shuffles.
    */
  def shardManifest(t: Tables, budget: Long = DefaultBudget): DataFrame =
    shardManifestOf(t.documents, budget)

  /** [[shardManifest]] over any (doc_id, text) frame — the partial-
    * manifest form an incremental writer rolls up.
    */
  def shardManifestOf(docs: DataFrame, budget: Long = DefaultBudget): DataFrame = {
    requirePow2(budget)
    shardedTokenCounts(docs)
      // 15 hex chars = 60 bits: inside conv()'s unsigned-64 exactness,
      // and 38 decimal digits hold the sum at any corpus size
      .withColumn("chk", conv(substring(col("pri"), 1, 15), 16, 10).cast("decimal(38,0)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("n_tokens"),
        sum(col("chk")).cast("decimal(38,0)").cast("string").as("manifest_hash"))
      .withColumn("n_seqs", expr(s"(n_tokens + $budget - 1) div $budget"))
      .withColumn("tail_fill_frac",
        round((col("n_tokens") - (col("n_seqs") - lit(1L)) * budget).cast("double") / budget, 6))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_seqs"),
        col("tail_fill_frac"), col("manifest_hash"))
      .orderBy(col("shard"))
  }

  /** p4: LENGTH-BUCKETED batching audit — the pad-don't-pack
    * alternative to p1 quantified: group documents into power-of-two
    * token-length buckets (the dynamic-batching scheme inference
    * servers and seq2seq fine-tuning use, where every sequence in a
    * batch pads to the bucket width) and report per bucket the doc
    * count, real tokens, padded tokens and the padding WASTE fraction.
    * Sums over the output reproduce the corpus-level pack-vs-pad
    * comparison against p2's fill stats.
    *
    * Bucket edges are exact integer powers: 2^(⌊log2(n − 0.5)⌋ + 1) —
    * the −0.5 keeps the log argument off every dyadic boundary, so the
    * floor is ulp-robust cross-engine (an exact-power doc count can
    * never flip buckets). One map-side token count, one bucket-keyed
    * aggregation of scalars; text never shuffles.
    */
  def lengthBuckets(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), size(ws_tokens(col("text"))).as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("bucket",
        expr("CAST(1 AS BIGINT) << (CAST(FLOOR(LOG2(CAST(n_tokens AS DOUBLE) - 0.5)) AS INT) + 1)"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("real_tokens"))
      .withColumn("padded_tokens", col("bucket") * col("n_docs"))
      .withColumn("waste_frac",
        round((col("padded_tokens") - col("real_tokens")).cast("double") / col("padded_tokens"), 6))
      .select(col("bucket"), col("n_docs"), col("real_tokens"),
        col("padded_tokens"), col("waste_frac"))
      .orderBy(col("bucket"))
}
