package graft

import scala.util.Random

import graft.sources.Warehouse

/** Model-based check of the store generation/segment/tag protocol: a
  * seeded random interleaving of rebuilds, appends (confirmed and
  * crash-unconfirmed), orphan appends (the lost append-vs-rebuild
  * race's residue), failed builds and minAge=0 vacuums is replayed
  * against a driver-side model, asserting after EVERY operation:
  *
  *   1. the segmented resolve = (model live base, model live segments)
  *      — no interleaving can surface a superseded or orphan segment;
  *   2. a CONFIRMED tag reports committed forever (through supersede
  *      and vacuum — the manifest fold preserves it);
  *   3. an UNCONFIRMED tag reports committed exactly while its base is
  *      live, and never again once superseded (its batch re-appends —
  *      duplicates over loss, the at-least-once contract).
  *
  * The example specs pin chosen interleavings; this sweeps hundreds of
  * random ones per seed, over BOTH marker media: the table-store
  * protocol and its path-store twin run the same parameterized body,
  * so the two backends cannot drift apart in what is tested.
  */
class WarehouseModelSpec extends SparkSpecBase {

  /** The six protocol entry points a backend exposes to the sweep. */
  private case class Proto(
      claim: () => Long,
      publish: Long => Unit,
      mark: (Long, Long, String) => Unit,
      confirm: String => Unit,
      burn: Long => Unit,
      vacuum: () => Unit,
      resolve: () => (Long, Seq[Long]),
      tagPublished: String => Boolean)

  private case class Tag(base: Long, confirmed: Boolean)

  private def sweep(seed: Int, p: Proto): Unit = {
    val rnd = new Random(seed)
    var liveBase: Option[Long] = None
    var liveSegs: Vector[Long] = Vector.empty
    var fullBuilds: Vector[Long] = Vector.empty
    var tags = Map.empty[String, Tag]
    var nextTag = 0

    def checkInvariants(): Unit = {
      liveBase.foreach { b =>
        val (gotBase, gotSegs) = p.resolve()
        assert(gotBase == b && gotSegs == liveSegs,
          s"[seed $seed] resolve=(${gotBase}, $gotSegs) model=($b, $liveSegs)")
      }
      tags.foreach { case (t, m) =>
        val expected = m.confirmed || liveBase.contains(m.base)
        assert(p.tagPublished(t) == expected,
          s"[seed $seed] tag $t (base ${m.base}, confirmed ${m.confirmed}, " +
            s"live $liveBase): expected committed=$expected")
      }
    }

    (1 to 60).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // REBUILD: new full build supersedes the group
          val g = p.claim()
          p.publish(g)
          liveBase = Some(g); liveSegs = Vector.empty; fullBuilds :+= g
        case 3 | 4 | 5 => // APPEND to the live base (70% confirmed)
          liveBase.foreach { b =>
            val g = p.claim()
            val t = s"s:$nextTag"; nextTag += 1
            p.mark(g, b, t)
            p.publish(g)
            val confirmed = rnd.nextInt(10) < 7
            if (confirmed) p.confirm(t)
            liveSegs :+= g; tags += t -> Tag(b, confirmed)
          }
        case 6 => // ORPHAN: a crashed appender's segment naming an OLD base
          fullBuilds.filterNot(liveBase.contains) match {
            case old if old.nonEmpty =>
              val b = old(rnd.nextInt(old.size))
              val g = p.claim()
              val t = s"s:$nextTag"; nextTag += 1
              p.mark(g, b, t)
              p.publish(g)
              tags += t -> Tag(b, confirmed = false)
            case _ =>
          }
        case 7 => // FAILED build: claim burned, invisible forever
          p.burn(p.claim())
        case _ => // VACUUM at minAge=0 (gate-caller shape)
          p.vacuum()
      }
      checkInvariants()
    }
  }

  test("random op interleavings preserve the resolve and tag-commit invariants (table store)") {
    Seq(1, 7, 42).foreach { seed =>
      val store = s"protomodel$seed"
      Warehouse.dropStore(spark, store, Seq("x"))
      sweep(seed, Proto(
        claim = () => Warehouse.claimGeneration(spark, store),
        publish = Warehouse.publishGeneration(spark, store, _),
        mark = (g, b, t) => Warehouse.markSegment(spark, store, g, b, Some(t)),
        confirm = Warehouse.confirmSegmentTag(spark, store, _),
        burn = Warehouse.burnClaim(spark, store, _),
        vacuum = () => Warehouse.vacuumSegmentedStore(spark, store, Seq("x"), minAgeMs = 0L),
        resolve = () => Warehouse.resolveSegmented(spark, store),
        tagPublished = Warehouse.segmentTagPublished(spark, store, _)))
      Warehouse.dropStore(spark, store, Seq("x"))
    }
  }

  test("the PATH-store protocol preserves the same invariants under random interleavings") {
    Seq(5, 23).foreach { seed =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_pathmodel$seed").resolve("idx").toString
      sweep(seed, Proto(
        claim = () => Warehouse.claimPathGeneration(root),
        publish = Warehouse.publishPathGeneration(root, _),
        mark = (g, b, t) => Warehouse.markPathSegment(root, g, b, Some(t)),
        confirm = Warehouse.confirmPathSegmentTag(root, _),
        burn = Warehouse.burnPathClaim(root, _),
        vacuum = () => Warehouse.vacuumPathSegmented(root, minAgeMs = 0L),
        resolve = () => Warehouse.resolvePathSegmented(root),
        tagPublished = Warehouse.pathSegmentTagPublished(root, _)))
    }
  }
}
