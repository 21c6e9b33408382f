package graft

import org.apache.spark.sql.DataFrame

/** Shared plumbing for the operator family. */
package object operators {

  /** Spread a narrow scan over all cores ONLY when it actually is narrow.
    *
    * The local testdata parquet is a single row-group, so the scan yields
    * 1-3 splits and every CPU-heavy per-row stage (shingling, hashing,
    * tokenizing) would run near-serially without a repartition. But the
    * repartition must not be unconditional: at 100 TB the same scan has
    * thousands of splits, and a full-corpus exchange of the heaviest
    * column (the text itself) is exactly the shuffle the bucketed designs
    * exist to avoid — the signatures need spreading, the text does not.
    * So: repartition only when the scan's split count is below the
    * cluster's parallelism; otherwise pass the input through untouched.
    *
    * `df.rdd.getNumPartitions` compiles the physical plan but runs no
    * job — the check itself is free.
    */
  private[graft] def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Default bound for the quadratic-blowup guards (d8 `maxClusterSize`,
    * s4 `maxBucketSize`, the store builds' `maxDf`/`maxBandBucket`): the
    * guards are ON by default, opt-out via explicit `None`. 2^20 is
    * generous — a key reaching it implies ~10^12 candidate pairs, a job
    * that would never finish anyway — so healthy corpora never trip it,
    * while a degenerate input (constant embeddings, a buggy upstream
    * labeler, corpus-hot boilerplate shingles) fails LOUDLY naming the
    * offending key instead of silently going quadratic at scale.
    */
  val QuadraticGuardDefault: Long = 1L << 20
}
