package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming forms of the training-data document operators: a document
  * stream (e.g. a crawl feed) deduplicated and quality-scored on the
  * way in. Stateless scoring composes for free; exact dedup keeps one
  * state entry per content hash (with an ingest-time watermark bounding
  * state in production feeds).
  */
object DocPipelines {

  /** Exact streaming dedup on content: first occurrence of each md5 wins.
    * With an `ingest_ts` column present, a watermark bounds the hash
    * state; without one the state grows with distinct content (fine for
    * bounded backfills, not endless feeds).
    */
  def exactDedupStream(docs: DataFrame, watermarkCol: Option[String] = None,
      delay: String = "1 hour"): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col("text")))
    watermarkCol match {
      case Some(ts) => hashed.withWatermark(ts, delay).dropDuplicates("content_hash")
      case None => hashed.dropDuplicates("content_hash")
    }
  }

  /** Stateless streaming quality scoring — same columns as the batch t2
    * operator, applied per micro-batch with zero state.
    */
  def qualityStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double") /
          greatest(length(col("text")), lit(1)), 6))
      .drop("toks")
}
