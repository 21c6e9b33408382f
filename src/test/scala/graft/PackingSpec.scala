package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.sources.Tables

/** p1/p2 sequence packing: layout invariants + plan shape. */
class PackingSpec extends SparkSpecBase {

  private lazy val t = Tables(spark, sfDir)
  private val B = Packing.DefaultBudget

  test("p1: per-shard offsets are a gapless concatenation in priority order") {
    val rows = Packing.sequencePack(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, docs) =>
      // orderBy(shard, start_tok) already sorted them; offsets must tile
      var expected = 0L
      docs.foreach { r =>
        assert(r.getAs[Long]("start_tok") == expected,
          s"gap/overlap at doc ${r.getAs[Long]("doc_id")}")
        expected += r.getAs[Long]("ws_tokens")
      }
    }
  }

  test("p1: sequence range is exactly the offset range div budget") {
    Packing.sequencePack(t).collect().foreach { r =>
      val start = r.getAs[Long]("start_tok")
      val end = start + r.getAs[Long]("ws_tokens")
      assert(r.getAs[Long]("seq_first") == start / B)
      assert(r.getAs[Long]("seq_last") == (end - 1) / B)
      assert(r.getAs[Long]("n_seqs") == (end - 1) / B - start / B + 1)
    }
  }

  test("p2: every sequence is exactly full except each shard's tail") {
    val stats = Packing.packStats(t).collect()
    val lastSeq = stats.groupBy(_.getAs[Int]("shard"))
      .map { case (sh, ss) => sh -> ss.map(_.getAs[Long]("seq_id")).max }
    stats.foreach { r =>
      val full = r.getAs[Long]("fill_tokens") == B
      val isTail = r.getAs[Long]("seq_id") == lastSeq(r.getAs[Int]("shard"))
      assert(full || isTail, s"underfull non-tail sequence: $r")
      assert(r.getAs[Long]("fill_tokens") <= B)
      assert(r.getAs[Long]("n_docs") >= 1)
      assert(r.getAs[Long]("n_spanning") <= r.getAs[Long]("n_docs"))
      assert(math.abs(r.getAs[Double]("fill_frac") -
        r.getAs[Long]("fill_tokens").toDouble / B) < 5e-7) // round(·, 6)
    }
  }

  test("p2 fill totals reconcile with p1's token counts") {
    val packed = Packing.sequencePack(t)
      .groupBy(col("shard")).agg(sum(col("ws_tokens")).as("tok")).collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("tok")).toMap
    val filled = Packing.packStats(t)
      .groupBy(col("shard")).agg(sum(col("fill_tokens")).as("tok")).collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("tok")).toMap
    assert(packed == filled, "every token lands in exactly one sequence's fill")
  }

  test("the packing shuffle never carries the text column") {
    // the per-shard window shuffles (doc_id, ws_tokens, pri, shard) only:
    // text dies map-side in the token-count scan (d9/dc9's invariant)
    Seq(Packing.sequencePack(t), Packing.packStats(t)).foreach { df =>
      val explain = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val offending = explain.split("\n\n").toSeq
        .filter(b => b.linesIterator.hasNext &&
          b.linesIterator.next().matches("""\(\d+\) Exchange.*"""))
        .filter(b => b.linesIterator.exists(l =>
          l.startsWith("Input ") && "(?<![\\w])text#\\d".r.findFirstIn(l).isDefined))
      assert(offending.isEmpty,
        s"an exchange carries the text payload:\n${offending.mkString("\n\n")}")
    }
  }
}
