package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls
import graft.sources.Tables

/** d11 URL canonicalization + dedup: hand-checked canonicalization
  * cases, dedup bookkeeping invariants, and the two-exchange plan lock.
  */
class UrlsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: hand-checked cases") {
    val cases = Seq(
      // case noise + www + default port + tracking + order + fragment + slash
      "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#f" -> "https://ex.com/a/b?a=1&b=2",
      // http default port, bare host → "/"
      "http://Host.com:80" -> "http://host.com/",
      // NON-default port survives
      "https://h.com:8443/x" -> "https://h.com:8443/x",
      // http on 443 is NOT default — kept
      "http://h.com:443/x" -> "http://h.com:443/x",
      // all params are tracking → no query at all
      "https://a.com/p?utm_a=1&utm_b=2&gclid=z" -> "https://a.com/p",
      // ref and fbclid stripped; empty segments dropped
      "https://a.com/p?ref=h&fbclid=1&&z=9" -> "https://a.com/p?z=9",
      // a param NAMED like but not equal to a tracking key survives
      "https://a.com/p?refresh=1" -> "https://a.com/p?refresh=1",
      // no scheme-relative corner: plain lowercase passthrough
      "https://a.com/p?b=2&a=1" -> "https://a.com/p?a=1&b=2")
    assert(canon(cases.map(_._1): _*) == cases.map(_._2))
  }

  test("d11: group sizes account for every doc, keepers are group minima, merges happen") {
    val out = Urls.urlDedup(t).collect()
    val total = t.documents.count()
    assert(out.map(_.getLong(2)).sum == total, "every doc lands in exactly one group")
    assert(out.exists(_.getLong(2) > 1), "the synthesized corpus must exercise real merges")
    // keeper == min doc_id within the group, recomputed independently
    val byCanon = t.documents.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(out.forall(r => r.getLong(1) >= byCanon.min))
    // canonical keys are unique (it's a groupBy) and sorted output
    val keys = out.map(_.getString(0)).toSeq
    assert(keys == keys.sorted && keys.distinct.size == keys.size)
  }

  test("d11: one aggregation exchange + the presentation sort, nothing else") {
    // canonicalization is map-side; the only exchanges are the canon-key
    // hash aggregation and the final orderBy's range partitioning
    val explain = Urls.urlDedup(t).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = explain.split("\n\n").toSeq.filter(b =>
      b.linesIterator.hasNext && b.linesIterator.next().matches("""\(\d+\) Exchange.*"""))
    assert(exchanges.length == 2, s"expected 2 exchanges, got:\n$explain")
    assert(exchanges.count(_.contains("rangepartitioning")) == 1
      && exchanges.count(_.contains("hashpartitioning")) == 1,
      s"expected one hash + one range exchange:\n$explain")
  }
}
