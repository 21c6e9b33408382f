package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Retrieval-path benchmark main: measures t17's map-side BM25 plan
  * (per-term tf as token-array arithmetic — the corpus text is never
  * exploded for a fixed |Q|-term query) against the equivalent
  * explode-to-token-table plan (the "build the inverted index on the
  * fly" shape: posexplode every token, per-doc length exchange,
  * per-(doc, term) tf exchange, df/stats joins). This is the claim the
  * t17 design makes: for query-time scoring, tf/dl should cost one
  * SCAN, not token-count-sized exchanges. Both plans produce the same
  * (doc_id, score) rows (asserted). Prints ONE JSON line;
  * RETRIEVALBENCH.md records quiet runs.
  */
object RetrievalBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_RETR_DOCS", "1000000").toLong
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")

    // deterministic ~30-token docs over a 5000-word vocabulary (the
    // StoreBench/DsirBench generator)
    def words(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", (0 until 30).map(i =>
        concat(lit("w"), pmod(xxhash64(seed * 31 + lit(i)), lit(5000)))): _*)
    val dir = java.nio.file.Files.createTempDirectory("retrbench").toString
    spark.range(0, nDocs)
      .select(col("id").as("doc_id"), words(col("id")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val terms = Seq("w17", "w42", "w999")

    def timedNoop(mk: => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // untimed warmup: JIT + page cache
      math.min(run(), run())
    }

    // t17's plan: tf/dl map-side over the token array; only compact
    // (doc, term, tf, dl) rows ever shuffle
    val mapSideSec = timedNoop(TextAnalysis.bm25(t, terms, topK = 20))

    // the explode plan: token table + per-doc dl exchange + per-(doc,
    // term) tf exchange + df/stats joins — what a naive port of a
    // row-store inverted-index build does per query
    import graft.functions.GraftFunctions.ws_tokens
    def explodePlan(): DataFrame = {
      val tok = t.documents
        .select(col("doc_id"), explode(ws_tokens(col("text"))).as("token"))
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).cast("double").as("dl"))
      val tf = tok.filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token").as("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")) / count(lit(1))).as("avgdl"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      tf.join(dl, Seq("doc_id"))
        .join(broadcast(dfT), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("tscore", TextAnalysis.bm25TermScore(
          col("tf"), col("dl"), col("df"), col("n_docs"), col("avgdl")))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("tscore")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("doc_id"), col("score"))
    }
    val explodeSec = timedNoop(explodePlan())

    // both plans must score identically — a speedup that changes the
    // answer is a bug, not a win. Scores compare with a half-ulp-safe
    // tolerance: the per-doc sum of the 6-dp-rounded term scores
    // accumulates in terms order map-side but in shuffle order in the
    // explode plan's groupBy, so an exact-double compare could flake at
    // a rounding-tie boundary
    // compared as a score-tolerant MULTISET, not positional rank/doc_id
    // equality: at a rounding-tie boundary a half-ulp score difference
    // legitimately swaps adjacent docs (or swaps which of two tied docs
    // makes the top-20 cutoff) — both plans are still correct
    val a = TextAnalysis.bm25(t, terms, topK = 20).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = explodePlan().collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val (am, bm) = (a.toMap, b.toMap)
    val sharedOk = a.forall { case (id, s) =>
      bm.get(id).forall(sb => math.abs(s - sb) <= 1e-6) }
    // docs present in only one plan must pair up by score with the other
    // plan's unmatched docs (a tie at the cutoff admitted a different doc)
    val onlyA = a.collect { case (id, s) if !bm.contains(id) => s }.sorted
    val onlyB = b.collect { case (id, s) if !am.contains(id) => s }.sorted
    val tieOk = onlyA.length == onlyB.length &&
      onlyA.zip(onlyB).forall { case (x, y) => math.abs(x - y) <= 1e-6 }
    require(a.length == b.length && sharedOk && tieOk,
      s"plans disagree beyond rounding ties: $a vs $b")

    println(s"""{"metric":"bm25_mapside_vs_explode","docs":$nDocs,""" +
      s""""mapside_sec":$mapSideSec,"explode_sec":$explodeSec,"cpus":$cpus}""")
    spark.stop()
  }
}
