package graft

import scala.util.Random

import graft.etl.SnapshotTable

/** Model-based sweep of SnapshotTable's commit machinery — seeded
  * random interleavings of appends, overwrites, read-modify-writes,
  * compactions, restores (to a random retained version) and minAge=0
  * vacuums replayed against a driver-side model, asserting after EVERY
  * operation:
  *
  *   1. the current read equals the model multiset;
  *   2. TIME TRAVEL: every retained version still reads exactly the
  *      multiset it committed (vacuum trims history to `keepVersions`
  *      but must never corrupt a kept version);
  *   3. compaction is content-neutral.
  *
  * SnapshotTableSpec pins chosen interleavings (races, stale rewrites);
  * this sweeps random ones.
  */
class SnapshotModelSpec extends SparkSpecBase {

  test("random op interleavings preserve content, retained history and compaction neutrality") {
    import spark.implicits._
    // seed 3 runs on the default POSIX StoreIO; seed 11 runs the SAME
    // sweep with the manifest plane on the in-memory impl; seed 17 on
    // the Hadoop-FS impl (the API family real clusters deploy) — the
    // three commit backends cannot drift apart in what the model checks
    Seq(3, 11, 17).foreach { seed =>
      val rnd = new Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_snapmodel$seed").resolve("t").toString
      val st =
        if (seed == 3) new SnapshotTable(spark, root)
        else if (seed == 11) new SnapshotTable(spark, root, new graft.sources.InMemoryStoreIO())
        else new SnapshotTable(spark, root, new graft.sources.HadoopFsStoreIO())

      def batch(): Seq[(Long, Long)] =
        Seq.fill(1 + rnd.nextInt(8))(
          (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      def readBack(v: Option[Long]): Seq[(Long, Long)] =
        st.read(v).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

      var current: Seq[(Long, Long)] = Seq.empty
      var history = Map.empty[Long, Seq[(Long, Long)]]

      (1 to 20).foreach { _ =>
        rnd.nextInt(11) match {
          case 0 | 1 | 2 | 3 =>
            val b = batch()
            val v = st.append(b.toDF("k", "v"))
            current = (current ++ b).sorted
            history += v -> current
          case 4 | 5 =>
            val b = batch()
            val v = st.overwrite(b.toDF("k", "v"))
            current = b.sorted
            history += v -> current
          case 6 if st.currentVersion.isDefined && current.nonEmpty =>
            val v = st.compact(2) // content-neutral rewrite
            history += v -> current
          case 7 if st.currentVersion.isDefined =>
            // read-modify-write: derive = existing plus one marker row
            val marker = (99L, rnd.nextInt(100).toLong)
            val (v, _) = st.overwriteWith { ex =>
              ex.map(_.unionByName(Seq(marker).toDF("k", "v")))
                .getOrElse(Seq(marker).toDF("k", "v"))
            }
            current = (current :+ marker).sorted
            history += v -> current
          case 8 | 9 =>
            st.vacuum(keepVersions = 2, minAgeMs = 0L)
            val kept = history.keys.toSeq.sorted.takeRight(2).toSet
            history = history.view.filterKeys(kept.contains).toMap
          case 10 if history.nonEmpty =>
            // restore to any RETAINED version: one manifest commit, the
            // head becomes that version's content, nothing else moves
            val keys = history.keys.toSeq.sorted
            val target = keys(rnd.nextInt(keys.size))
            val v = st.restore(target)
            current = history(target)
            history += v -> current
          case _ => // compact/derive/restore drawn before anything committed: no-op
        }
        if (st.currentVersion.isDefined) {
          assert(readBack(None) == current, s"[seed $seed] current read diverged")
          history.foreach { case (v, rows) =>
            assert(readBack(Some(v)) == rows,
              s"[seed $seed] retained version $v no longer reads its committed content")
          }
        }
      }
    }
  }
}
