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

  test("p5: manifest reconciles with p1's layout; checksum is order-free, mergeable, and tamper-evident") {
    val manifest = Packing.shardManifest(t).collect()
      .map(r => r.getAs[Int]("shard") -> r).toMap
    val layout = Packing.sequencePack(t).collect().groupBy(_.getAs[Int]("shard"))
    assert(manifest.keySet == layout.keySet)
    layout.foreach { case (sh, docs) =>
      val m = manifest(sh)
      assert(m.getAs[Long]("n_docs") == docs.length)
      assert(m.getAs[Long]("n_tokens") == docs.map(_.getAs[Long]("ws_tokens")).sum)
      assert(m.getAs[Long]("n_seqs") == docs.map(_.getAs[Long]("seq_last")).max + 1,
        "the manifest's sequence count must match the layout's last sequence")
      val tail = m.getAs[Long]("n_tokens") - (m.getAs[Long]("n_seqs") - 1) * B
      assert(math.abs(m.getAs[Double]("tail_fill_frac") - tail.toDouble / B) < 5e-7)
    }

    // checksum: driver recompute from per-doc md5 prefixes (order-free
    // exact integer sum), tamper-evidence via a dropped doc
    val perDoc = t.documents
      .select(col("doc_id"), conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("decimal(38,0)").as("chk"),
        size(graft.functions.GraftFunctions.ws_tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("int"))
      .collect()
    val expected = perDoc.groupBy(_.getAs[Int]("shard"))
      .map { case (sh, rs) => sh -> rs.map(r => BigDecimal(r.getAs[java.math.BigDecimal]("chk"))).sum }
    manifest.foreach { case (sh, m) =>
      val hash = m.getAs[String]("manifest_hash")
      assert(hash.matches("\\d+"),
        "the checksum must be a plain digit string — representation-proof " +
          "through any float-path canonicalization")
      assert(BigDecimal(hash) == expected(sh),
        s"shard $sh checksum must equal the order-free per-doc sum")
    }
    // mergeability: two partial manifests roll up to the full one
    // (counts and checksum add; n_seqs/tail are layout-level, recomputed)
    def partial(df: org.apache.spark.sql.DataFrame) =
      Packing.shardManifestOf(df).collect()
        .map(r => r.getAs[Int]("shard") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            BigDecimal(r.getAs[String]("manifest_hash"))))).toMap
    val lo = partial(t.documents.filter(col("doc_id") < 50L))
    val hi = partial(t.documents.filter(col("doc_id") >= 50L))
    manifest.foreach { case (sh, m) =>
      val (ld, lt, lh) = lo.getOrElse(sh, (0L, 0L, BigDecimal(0)))
      val (hd, ht, hh) = hi.getOrElse(sh, (0L, 0L, BigDecimal(0)))
      assert(m.getAs[Long]("n_docs") == ld + hd &&
        m.getAs[Long]("n_tokens") == lt + ht &&
        BigDecimal(m.getAs[String]("manifest_hash")) == lh + hh,
        s"shard $sh partial manifests must merge to the full manifest")
    }

    val tampered = Packing.shardManifestOf(t.documents.filter(col("doc_id") =!= 0L))
    val sh0 = perDoc.find(_.getAs[Long]("doc_id") == 0L).map(_.getAs[Int]("shard"))
    sh0.foreach { sh =>
      val after = tampered.collect().map(r => r.getAs[Int]("shard") -> r).toMap
      assert(BigDecimal(after(sh).getAs[String]("manifest_hash")) !=
        BigDecimal(manifest(sh).getAs[String]("manifest_hash")),
        "dropping a doc must change its shard's checksum")
    }
  }

  test("p4: buckets are tight powers of two and totals reconcile with the corpus") {
    import org.apache.spark.sql.functions._
    val rows = Packing.lengthBuckets(t).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("real_tokens"), r.getAs[Long]("padded_tokens"),
        r.getAs[Double]("waste_frac")))
    assert(rows.nonEmpty)
    rows.foreach { case (b, nd, real, padded, waste) =>
      assert(java.lang.Long.bitCount(b) == 1, s"bucket $b must be a power of two")
      assert(padded == b * nd)
      // tightness: every member fits the bucket and NOT the next one down
      assert(real <= padded && real > (b / 2) * nd,
        s"bucket $b holds ${real} real tokens for $nd docs — members must need THIS bucket")
      val exp = BigDecimal((padded - real).toDouble / padded)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(waste == exp)
    }
    // per-doc assignment: n_tokens in (bucket/2, bucket]
    val lens = t.documents
      .select(size(graft.functions.GraftFunctions.ws_tokens(col("text"))).as("n"))
      .collect().map(_.getInt(0)).filter(_ >= 1)
    val byBucket = lens.groupBy { n =>
      var b = 1L; while (b < n) b <<= 1; b
    }.view.mapValues(ns => (ns.length.toLong, ns.map(_.toLong).sum)).toMap
    assert(rows.map(r => r._1 -> ((r._2, r._3))).toMap == byBucket,
      "bucket membership must equal the brute-force next-power-of-two assignment")
  }

  test("p3: positions are a permutation, per-source order is preserved, prefixes track weights") {
    val rows = Packing.epochInterleave(t).collect()
    val n = rows.length
    // global_pos is exactly 1..N
    assert(rows.map(_.getAs[Int]("global_pos")).sorted.toSeq == (1 to n),
      "global positions must be a permutation of 1..N")
    // within each source, src_rank increases with global_pos (stable order)
    rows.sortBy(_.getAs[Int]("global_pos"))
      .groupBy(_.getAs[String]("source")).foreach { case (s, docs) =>
        val ranks = docs.map(_.getAs[Long]("src_rank")).toSeq
        assert(ranks == ranks.sorted, s"source $s schedule must preserve priority order")
      }
    // the exact stride-scheduling invariant: close a prefix at its key
    // cutoff K (including the whole tie group), then each source holds
    // min(n_s, floor(K·w_s + 0.5)) docs — proportional to its weight
    // until the source runs dry (±1 for float boundary rounding)
    val w = rows.map(_.getAs[String]("source")).distinct
      .map(s => s -> (s.drop(3).toInt % 3 + 1).toDouble).toMap
    val docsK = rows.map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("src_rank"), r.getAs[Int]("global_pos")))
    def keyOf(s: String, r: Long): Double = (r - 0.5) / w(s)
    Seq(n / 4, n / 2).foreach { p =>
      val cutoff = docsK.filter(_._3 <= p).map { case (s, r, _) => keyOf(s, r) }.max
      val counts = docsK.filter { case (s, r, _) => keyOf(s, r) <= cutoff }
        .groupBy(_._1).view.mapValues(_.length).toMap
      w.foreach { case (s, ws) =>
        val nS = docsK.count(_._1 == s)
        val predicted = math.min(nS.toDouble, math.floor(cutoff * ws + 0.5))
        assert(math.abs(counts.getOrElse(s, 0) - predicted) <= 1.0,
          s"prefix $p (key cutoff $cutoff): source $s got ${counts.getOrElse(s, 0)} predicted $predicted")
      }
    }
  }

  test("p3: equals the single-window recompute") {
    import spark.implicits._
    val got = Packing.epochInterleave(t)
      .select(col("global_pos"), col("doc_id")).as[(Int, Long)].collect().toMap
    val keyed = t.documents.select(col("doc_id"), col("source"))
      .withColumn("src_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .withColumn("w", (expr("try_cast(substr(source, 4) as int)") % 3 + 1).cast("double"))
      .withColumn("k", (col("src_rank").cast("double") - lit(0.5)) / col("w"))
      .withColumn("global_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("source"), col("doc_id"))))
      .select(col("global_pos"), col("doc_id")).as[(Int, Long)].collect().toMap
    assert(got == keyed)
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
