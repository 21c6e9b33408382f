package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.sources.{Tables, Warehouse}

/** BPE scale benchmark: substantiates t13/t14's two cost claims with
  * measurements instead of prose —
  *
  *  1. "the corpus is never rescanned": training = ONE corpus-sized
  *     word-count scan + N dict-only merge rounds. With a FIXED
  *     vocabulary, the scan must grow with corpus size while the merge
  *     rounds stay flat (they touch only the cached dict).
  *  2. "train once, encode forever": `bpeEncodeAgainstStore` probes the
  *     persisted dict and skips training entirely — the win over the
  *     in-job `bpeEncode` (which re-trains) grows with every re-encode
  *     of the same corpus and is the whole point of the store.
  *
  * Synthetic corpus: every doc is 30 words drawn deterministically from
  * a fixed 5 000-word alphabetic vocabulary (digits transliterated to
  * letters so the subword pre-tokenizer keeps words whole) — corpus
  * size scales, dict size does not, isolating the two cost curves.
  * One JSON line per size; BPEBENCH.md records a quiet run.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_BPE_ROWS", "300000,1000000,3000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long): DataFrame =
      spark.range(0, n).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(29)),
          i => concat(lit("w"), translate(((col("id") * 31 + i * 7) % 5000).cast("string"),
            "0123456789", "abcdefghij")))).as("text"))

    def timed[A](run: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = run
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    sizes.foreach { n =>
      val dir = s"/tmp/graft_bpebench_$n"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      corpus(n).write.parquet(s"$dir/documents.parquet")
      val t = Tables(spark, dir)

      // claim 1: the corpus-sized stage vs the dict-only rounds
      val (scanSec, vocab) = timed(Bpe.wordFreq(t).count())
      val (trainSec, steps) = timed(Bpe.bpeMerges(t).collect().length)
      val roundsSec = trainSec - scanSec // rounds + per-round collects

      // claim 2: in-job encode (re-trains) vs store probe (train once)
      val store = s"bpebench_$n"
      Warehouse.dropStore(spark, store, Seq("dict", "merges"))
      val (buildSec, _) = timed(Bpe.buildDictStore(t, store))
      val (encodeJobSec, _) = timed(sink(Bpe.bpeEncode(t)))
      val (encodeStoreSec, _) = timed(sink(Bpe.bpeEncodeAgainstStore(t, store)))

      println(s"""{"metric":"bpe_scale","docs":$n,"vocab":$vocab,"merges":$steps,""" +
        s""""scan_sec":$scanSec,"train_sec":$trainSec,"rounds_sec":$roundsSec,""" +
        s""""store_build_sec":$buildSec,"encode_injob_sec":$encodeJobSec,""" +
        s""""encode_store_sec":$encodeStoreSec,"cpus":$cpus}""")
    }
    spark.stop()
  }
}
