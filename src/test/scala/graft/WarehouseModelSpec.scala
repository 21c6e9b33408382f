package graft

import scala.util.Random

import graft.sources.Warehouse

/** Model-based check of the store generation/segment/tag protocol: a
  * seeded random interleaving of rebuilds, appends (confirmed and
  * crash-unconfirmed), orphan appends (the lost append-vs-rebuild
  * race's residue), failed builds and minAge=0 vacuums is replayed
  * against a driver-side model, asserting after EVERY operation:
  *
  *   1. `resolveSegmented` = (model live base, model live segments) —
  *      no interleaving can surface a superseded or orphan segment;
  *   2. a CONFIRMED tag reports committed forever (through supersede
  *      and vacuum — the manifest fold preserves it);
  *   3. an UNCONFIRMED tag reports committed exactly while its base is
  *      live, and never again once superseded (its batch re-appends —
  *      duplicates over loss, the at-least-once contract).
  *
  * The example specs pin chosen interleavings; this sweeps hundreds of
  * random ones per seed.
  */
class WarehouseModelSpec extends SparkSpecBase {

  private case class Tag(base: Long, confirmed: Boolean)

  test("random op interleavings preserve the resolve and tag-commit invariants") {
    Seq(1, 7, 42).foreach { seed =>
      val rnd = new Random(seed)
      val store = s"protomodel$seed"
      Warehouse.dropStore(spark, store, Seq("x"))

      var liveBase: Option[Long] = None
      var liveSegs: Vector[Long] = Vector.empty
      var fullBuilds: Vector[Long] = Vector.empty
      var tags = Map.empty[String, Tag]
      var nextTag = 0

      def checkInvariants(): Unit = {
        liveBase.foreach { b =>
          val (gotBase, gotSegs) = Warehouse.resolveSegmented(spark, store)
          assert(gotBase == b && gotSegs == liveSegs,
            s"[seed $seed] resolve=(${gotBase}, $gotSegs) model=($b, $liveSegs)")
        }
        tags.foreach { case (t, m) =>
          val expected = m.confirmed || liveBase.contains(m.base)
          assert(Warehouse.segmentTagPublished(spark, store, t) == expected,
            s"[seed $seed] tag $t (base ${m.base}, confirmed ${m.confirmed}, " +
              s"live $liveBase): expected committed=$expected")
        }
      }

      (1 to 60).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 => // REBUILD: new full build supersedes the group
            val g = Warehouse.claimGeneration(spark, store)
            Warehouse.publishGeneration(spark, store, g)
            liveBase = Some(g); liveSegs = Vector.empty; fullBuilds :+= g
          case 3 | 4 | 5 => // APPEND to the live base (70% confirmed)
            liveBase.foreach { b =>
              val g = Warehouse.claimGeneration(spark, store)
              val t = s"s:$nextTag"; nextTag += 1
              Warehouse.markSegment(spark, store, g, b, Some(t))
              Warehouse.publishGeneration(spark, store, g)
              val confirmed = rnd.nextInt(10) < 7
              if (confirmed) Warehouse.confirmSegmentTag(spark, store, t)
              liveSegs :+= g; tags += t -> Tag(b, confirmed)
            }
          case 6 => // ORPHAN: a crashed appender's segment naming an OLD base
            fullBuilds.filterNot(liveBase.contains) match {
              case old if old.nonEmpty =>
                val b = old(rnd.nextInt(old.size))
                val g = Warehouse.claimGeneration(spark, store)
                val t = s"s:$nextTag"; nextTag += 1
                Warehouse.markSegment(spark, store, g, b, Some(t))
                Warehouse.publishGeneration(spark, store, g)
                tags += t -> Tag(b, confirmed = false)
              case _ =>
            }
          case 7 => // FAILED build: claim burned, invisible forever
            val g = Warehouse.claimGeneration(spark, store)
            Warehouse.burnClaim(spark, store, g)
          case _ => // VACUUM at minAge=0 (gate-caller shape)
            Warehouse.vacuumSegmentedStore(spark, store, Seq("x"), minAgeMs = 0L)
        }
        checkInvariants()
      }
      Warehouse.dropStore(spark, store, Seq("x"))
    }
  }

  test("the PATH-store protocol preserves the same invariants under random interleavings") {
    Seq(5, 23).foreach { seed =>
      val rnd = new Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_pathmodel$seed").resolve("idx").toString

      var liveBase: Option[Long] = None
      var liveSegs: Vector[Long] = Vector.empty
      var fullBuilds: Vector[Long] = Vector.empty
      var tags = Map.empty[String, Tag]
      var nextTag = 0

      def checkInvariants(): Unit = {
        liveBase.foreach { b =>
          val (gotBase, gotSegs) = Warehouse.resolvePathSegmented(root)
          assert(gotBase == b && gotSegs == liveSegs,
            s"[seed $seed] resolve=(${gotBase}, $gotSegs) model=($b, $liveSegs)")
        }
        tags.foreach { case (t, m) =>
          val expected = m.confirmed || liveBase.contains(m.base)
          assert(Warehouse.pathSegmentTagPublished(root, t) == expected,
            s"[seed $seed] tag $t: expected committed=$expected")
        }
      }

      (1 to 60).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 =>
            val g = Warehouse.claimPathGeneration(root)
            Warehouse.publishPathGeneration(root, g)
            liveBase = Some(g); liveSegs = Vector.empty; fullBuilds :+= g
          case 3 | 4 | 5 =>
            liveBase.foreach { b =>
              val g = Warehouse.claimPathGeneration(root)
              val t = s"s:$nextTag"; nextTag += 1
              Warehouse.markPathSegment(root, g, b, Some(t))
              Warehouse.publishPathGeneration(root, g)
              val confirmed = rnd.nextInt(10) < 7
              if (confirmed) Warehouse.confirmPathSegmentTag(root, t)
              liveSegs :+= g; tags += t -> Tag(b, confirmed)
            }
          case 6 =>
            fullBuilds.filterNot(liveBase.contains) match {
              case old if old.nonEmpty =>
                val b = old(rnd.nextInt(old.size))
                val g = Warehouse.claimPathGeneration(root)
                val t = s"s:$nextTag"; nextTag += 1
                Warehouse.markPathSegment(root, g, b, Some(t))
                Warehouse.publishPathGeneration(root, g)
                tags += t -> Tag(b, confirmed = false)
              case _ =>
            }
          case 7 =>
            val g = Warehouse.claimPathGeneration(root)
            Warehouse.burnPathClaim(root, g)
          case _ =>
            Warehouse.vacuumPathSegmented(root, minAgeMs = 0L)
        }
        checkInvariants()
      }
    }
  }
}
