package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Ingest benchmark main: measures incremental MinHash dedup of a new
  * batch THROUGH the persisted signature store
  * ([[Dedup.minhashIncrementalAgainstStore]]) against the in-job form
  * that re-hashes the whole corpus every run ([[Dedup.minhashIncremental]]),
  * on a synthetic corpus large enough that corpus re-hashing dominates.
  *
  * This is the claim the store APIs exist for: ingest cost should track
  * the BATCH, not the corpus. The store build is timed separately — it
  * is paid once per corpus generation and amortizes over every
  * subsequent ingest. Prints ONE JSON line; STOREBENCH.md records a
  * quiet run.
  */
object StoreBench {
  /** Deterministic ~30-token docs over a 5000-word vocabulary — ONE
    * generator shared by StoreBench and [[AppendBench]] so the two
    * benches' corpora stay formula-identical (their numbers are
    * compared against each other in STOREBENCH.md).
    */
  private[graft] def syntheticWords(seed: org.apache.spark.sql.Column,
      from: Int = 0): org.apache.spark.sql.Column =
    concat_ws(" ", (from until 30).map(i =>
      concat(lit("w"), pmod(xxhash64(seed * 31 + lit(i)), lit(5000)))): _*)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nCorpus = sys.env.getOrElse("SPARK_GRAFT_STORE_CORPUS", "200000").toLong
    val nBatch = sys.env.getOrElse("SPARK_GRAFT_STORE_BATCH", "2000").toLong
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")

    // every 20th batch doc is a NEAR-dup of a corpus doc — one fresh
    // token prepended to the corpus doc's 29-token suffix (2-gram
    // shingle Jaccard ≈ 0.9), so the pairs that survive banding exercise
    // the near-dup path rather than trivial exact copies — while the
    // bulk of the batch is fresh text
    def words(seed: org.apache.spark.sql.Column, from: Int = 0): org.apache.spark.sql.Column =
      syntheticWords(seed, from)
    val corpus = spark.range(0, nCorpus)
      .select(col("id").as("doc_id"), words(col("id")).as("text"))
    val batch = spark.range(nCorpus, nCorpus + nBatch)
      .select(col("id").as("doc_id"),
        when(col("id") % 20 === 0,
          concat_ws(" ", concat(lit("x"), col("id")), words(col("id") - nCorpus + 1, from = 1)))
          .otherwise(words(col("id"))).as("text"))

    // the in-job operator reads a Tables dir: materialize corpus+batch
    // exactly once so parquet scan cost is identical for both paths
    val dir = java.nio.file.Files.createTempDirectory("storebench").toString
    corpus.unionByName(batch).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val corpusDocs = t.documents.filter(col("doc_id") < nCorpus)
    val batchDocs = t.documents.filter(col("doc_id") >= nCorpus)

    def timed(mk: => DataFrame): (Double, Long) = {
      mk.count() // untimed warmup: JIT + page cache, like Bench's table warmup
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      reps.minBy(_._1)
    }

    graft.sources.Warehouse.dropStore(spark, "storebench_sig", Seq("bands", "sigs"))
    val tb0 = System.nanoTime()
    Dedup.buildSignatureStore(corpusDocs, "storebench_sig")
    val buildSec = (System.nanoTime() - tb0) / 1e9

    val (probeSec, probeRows) = timed(
      Dedup.minhashIncrementalAgainstStore("storebench_sig", batchDocs))
    val (inJobSec, inJobRows) = timed(Dedup.minhashIncremental(t, nCorpus))

    assert(probeRows == inJobRows,
      s"store probe must equal the in-job operator: $probeRows vs $inJobRows")

    // same comparison for the substring-granularity store (d10's shape):
    // positional shingle index on disk vs per-run corpus re-tokenization
    graft.sources.Warehouse.dropStore(spark, "storebench_sub", Seq("shingles"))
    val ts0 = System.nanoTime()
    Dedup.buildSubstringStore(corpusDocs, "storebench_sub")
    val subBuildSec = (System.nanoTime() - ts0) / 1e9
    val (subProbeSec, subProbeRows) = timed(
      Dedup.substringSpansAgainstStore("storebench_sub", batchDocs))
    val (subInJobSec, subInJobRows) = timed(Dedup.substringSpansIncremental(t, nCorpus))
    assert(subProbeRows == subInJobRows,
      s"substring store probe must equal the in-job operator: $subProbeRows vs $subInJobRows")

    println(s"""{"metric":"store_probe_vs_injob","corpus_docs":$nCorpus,"batch_docs":$nBatch,""" +
      s""""store_build_sec":$buildSec,"probe_sec":$probeSec,"injob_sec":$inJobSec,""" +
      s""""pairs_found":$probeRows,"sub_build_sec":$subBuildSec,"sub_probe_sec":$subProbeSec,""" +
      s""""sub_injob_sec":$subInJobSec,"sub_spans_found":$subProbeRows,"cpus":$cpus}""")
    spark.stop()
  }
}
