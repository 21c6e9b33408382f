package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.bucket_weight_sum
import graft.operators.TextAnalysis
import graft.sources.Tables

/** t11 DSIR importance weights: kernel bucketing semantics, equivalence
  * of the map-side scoring kernel to an explode+join recompute, ranking
  * sanity, and the zero-shuffle scoring plan lock.
  */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("bucket_weight_sum: signed pmod bucketing matches the by-hand fold") {
    // negative hashes must land in the same bucket as the oracle's
    // unsigned mod (power-of-two modulus: low bits agree)
    val lam = (0 until 1024).map(_.toDouble)
    val got = Seq(Tuple1(Array(-1L, 5L, 1023L, -1024L))).toDF("h")
      .select(bucket_weight_sum(col("h"), lam).as("s"))
      .head().getDouble(0)
    assert(got == 1023.0 + 5.0 + 1023.0 + 0.0)
  }

  test("t11: scoring kernel equals the explode+join recompute") {
    val lam = TextAnalysis.dsirLambda(t.documents, benchSplit = 50, buckets = 1024)
    val fast = TextAnalysis.dsirScore(t.documents.filter(col("doc_id") >= 50), lam)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val lamDf = lam.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq.toDF("b", "w")
    val slow = t.documents.filter(col("doc_id") >= 50)
      .select(col("doc_id"), explode(TextAnalysis.dsirFeats(col("text"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(1024L)).as("b"))
      .join(lamDf, "b").groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("lw"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, (n, w)) =>
      assert(n == slow(id)._1, s"doc $id feature count")
      // fast is rounded to 6 decimals; reassociation noise is far below
      assert(math.abs(w - slow(id)._2) < 1e-5, s"doc $id weight $w vs ${slow(id)._2}")
    }
  }

  test("t11: a target-like raw doc outscores junk") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox naps under the shady tree"),
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "zzz qqq xxx yyy www vvv uuu ttt sss rrr")
    ).toDF("doc_id", "text")
    val lam = TextAnalysis.dsirLambda(docs, benchSplit = 50, buckets = 1024)
    val scores = TextAnalysis.dsirScore(docs.filter(col("doc_id") >= 50), lam)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(scores(100L) > scores(101L),
      s"target-duplicate ${scores(100L)} must outscore junk ${scores(101L)}")
  }

  test("globalRunningSum equals the single-window recompute") {
    val df = (1 to 97).map(i => (i.toLong, (i * 37 % 11).toLong, (i * 13 % 7).toLong))
      .toDF("id", "key", "v")
    val got = graft.operators.Ranking.globalRunningSum(
        df, Seq(col("key"), col("id")), col("v"), "rs", numPartitions = Some(5))
      .select(col("id"), col("rs")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = df.withColumn("rs", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("key"), col("id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("id"), col("rs")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("dc11: the selection is exactly the greedy best-score prefix of the budget") {
    val out = graft.operators.Curation.dsirSelect(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // recompute the greedy cut driver-side from the same scores
    val lam = TextAnalysis.dsirLambda(t.documents)
    val scored = t.documents.filter(col("doc_id") >= 50)
      .select(col("doc_id"),
        size(graft.functions.GraftFunctions.ws_tokens(col("text"))).cast("long").as("n_tokens"),
        round(bucket_weight_sum(TextAnalysis.dsirFeats(col("text")), lam.toSeq)
          / size(TextAnalysis.dsirFeats(col("text"))).cast("double"), 4).as("score"),
        md5(col("doc_id").cast("string")).as("pri"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val orderKey = scored.sortBy { case (id, _, s, pri) => (-s, pri, id) }
    var cum = 0L
    val greedy = orderKey.iterator.map { case (id, n, s, _) =>
      cum += n; (id, n, s, cum)
    }.takeWhile(_._4 <= 20000).toSeq
    assert(out.toSeq == greedy, "selection must be the greedy prefix in (score desc, md5) order")
    assert(out.nonEmpty && out.length < scored.length,
      "the budget must genuinely cut (otherwise the test is vacuous)")
  }

  test("t11: scoring is one map-side pass — only the presentation-sort exchange") {
    val lam = Array.fill(1024)(0.1)
    val explain = TextAnalysis.dsirScore(t.documents, lam).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = explain.split("\n\n").toSeq.filter(b =>
      b.linesIterator.hasNext && b.linesIterator.next().matches("""\(\d+\) Exchange.*"""))
    assert(exchanges.length == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected only the presentation-sort exchange, got:\n$explain")
  }
}
