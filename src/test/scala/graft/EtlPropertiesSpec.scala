package graft

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.etl.{JdbcMergeSink, Pipeline}

/** Property-based checks of the etl/packing algebra — the laws the
  * seam contracts depend on for ANY input, not just the example specs'
  * shapes: merge is a key-unique last-write-wins fold that is
  * idempotent and batch-split-invariant (the ON CONFLICT semantics),
  * shard manifests roll up over ANY partition of the corpus, and the
  * JDBC upsert dialects bind exactly their statements' parameters.
  */
class EtlPropertiesSpec extends SparkSpecBase {

  // pinned-seed sampling so a failing draw is REPLAYABLE (the model
  // sweeps in this diff pin seeds for the same reason)
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  // a fresh increment: small key domain (forces conflicts), versions
  // deduped per (key, version) — two fresh rows with the SAME key and
  // version are an ill-formed increment (the destination's tie is
  // undefined there, in ours and in Postgres)
  private val freshGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.chooseNum(0L, 7L)
      v <- Gen.identifier.map(_.take(4))
      ver <- Gen.chooseNum(0L, 4L)
    } yield (k, v, ver)).map(_.groupBy(r => (r._1, r._3)).values.map(_.head).toList)

  test("merge: key-unique LWW by version, idempotent, batch-split-invariant") {
    import spark.implicits._
    val keys = Seq("k")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
      df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

    samples(Gen.zip(freshGen, freshGen, freshGen), 8).foreach { case (e0, f0, f1) =>
      // an existing table is itself a merge result: normalize first
      val existing = Pipeline.merge(None, e0.toDF("k", "v", "ver"), keys, Some("ver"))
      val fresh = f0.toDF("k", "v", "ver")
      val out = Pipeline.merge(Some(existing), fresh, keys, Some("ver"))
      val got = rowsOf(out)

      // law 1: exactly one row per key over the union key set
      val em = rowsOf(existing)
      val fm = f0.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(r => (r._2, r._3)).maxBy(r => (r._2, r._1))
      }
      assert(got.keySet == em.keySet ++ fm.keySet)

      // law 2: the survivor carries the max version; on an
      // existing-vs-fresh version tie the FRESH row wins (the upsert)
      got.foreach { case (k, (v, ver)) =>
        (em.get(k), fm.get(k)) match {
          case (Some((ev, evr)), Some((fv, fvr))) =>
            if (fvr >= evr) assert((v, ver) == (fv, fvr), s"fresh wins at key $k")
            else assert((v, ver) == (ev, evr), s"newer existing survives at key $k")
          case (Some(er), None) => assert((v, ver) == er)
          case (None, Some(fr)) => assert((v, ver) == fr)
          case (None, None) => fail(s"phantom key $k")
        }
      }

      // law 3: idempotence — re-publishing the same increment is a no-op
      assert(rowsOf(Pipeline.merge(Some(out), fresh, keys, Some("ver"))) == got,
        "replaying the increment must not change the table")

      // law 4: batch-split invariance — two increments with globally
      // deduped (key, version) pairs merge to the same table whether
      // applied separately or concatenated
      val f1d = f1.filterNot(r => f0.exists(x => x._1 == r._1 && x._3 == r._3))
      val stepwise = Pipeline.merge(
        Some(Pipeline.merge(Some(existing), fresh, keys, Some("ver"))),
        f1d.toDF("k", "v", "ver"), keys, Some("ver"))
      val oneShot = Pipeline.merge(Some(existing),
        (f0 ++ f1d).toDF("k", "v", "ver"), keys, Some("ver"))
      assert(rowsOf(stepwise) == rowsOf(oneShot),
        "merging increments batch-by-batch must equal merging their union")
    }
  }

  test("shard manifests roll up over ANY random partition of the corpus") {
    val t = graft.sources.Tables(spark, sfDir)
    val full = graft.operators.Packing.shardManifestOf(t.documents).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), BigInt(r.getString(5))))).toMap

    samples(Gen.chooseNum(1, 1000000), 4).foreach { seed =>
      val parts = (0 until 3).map(i =>
        t.documents.filter(pmod(xxhash64(col("doc_id"), lit(seed)), lit(3)) === i))
      val partials = parts.map(p =>
        graft.operators.Packing.shardManifestOf(p).collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), BigInt(r.getString(5))))).toMap)
      val rolled = partials.flatMap(_.toSeq)
        .groupBy(_._1)
        .map { case (sh, rs) =>
          sh -> ((rs.map(_._2._1).sum, rs.map(_._2._2).sum, rs.map(_._2._3).sum))
        }
      assert(rolled == full,
        s"partial manifests under split seed $seed must roll up to the full manifest")
    }
  }

  test("upsert dialects bind exactly their statements' parameters, for any identifier sets") {
    val identGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
      .map(_.distinct).suchThat(_.nonEmpty)
    samples(Gen.zip(identGen, Gen.chooseNum(1, 3)), 60).foreach { case (cols0, nk) =>
      val columns = cols0.take(6)
      val keys = columns.take(math.min(nk, columns.size))
      val nonKeys = columns.filterNot(keys.contains)

      val pg = JdbcMergeSink.PostgresOnConflict.plan("t", columns, keys)
      assert(pg.statements.size == 1 && !pg.stopOnFirstChange)
      val (pgSql, pgBind) = pg.statements.head
      assert(pgBind == columns, "insert binds every column once, in order")
      assert(pgSql.count(_ == '?') == pgBind.size, "one marker per bound column")
      if (nonKeys.isEmpty) assert(pgSql.endsWith("DO NOTHING"))
      else assert(nonKeys.forall(c => pgSql.contains(s"$c = EXCLUDED.$c")))

      val up = JdbcMergeSink.UpdateThenInsert.plan("t", columns, keys)
      assert(up.stopOnFirstChange && up.statements.size == 2)
      val (updSql, updBind) = up.statements.head
      val (insSql, insBind) = up.statements(1)
      assert(insBind == columns && insSql.count(_ == '?') == columns.size)
      assert(updBind == (if (nonKeys.isEmpty) keys else nonKeys ++ keys),
        "update binds SET parameters first, then the WHERE keys")
      assert(updSql.count(_ == '?') == updBind.size,
        s"one marker per bound column in '$updSql'")
    }
  }
}
