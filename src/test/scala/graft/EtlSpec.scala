package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{MetadataStore, Pipeline, PipelineRunner}
import graft.sources.{CsvSource, Tables}

class EtlSpec extends SparkSpecBase {

  private def freshDirs(): (String, String) = {
    val wh = Files.createTempDirectory("graft_wh_").toString
    val md = Files.createTempDirectory("graft_md_").toString
    (wh, md)
  }

  private val specs = Seq(
    Pipeline.TableSpec("dim_customer", Pipeline.PreSeason, Nil, Seq("c_custkey")),
    Pipeline.TableSpec("dim_nation", Pipeline.PreSeason, Nil, Seq("n_nationkey")),
    Pipeline.TableSpec("fact_events", Pipeline.PostRace, Seq("dim_customer"),
      Seq("event_id"), versionColumn = Some("ts")))

  private def extracts(wm: Long => Long = identity): Map[String, Pipeline.Extract] = Map(
    "dim_customer" -> ((s, _) => Tables(s, sfDir).customer),
    "dim_nation" -> ((s, _) => Tables(s, sfDir).nation),
    "fact_events" -> ((s, since) => {
      val ev = Tables(s, sfDir).events
      since match {
        case Some(mark) => ev.filter(unix_timestamp(col("ts")) > mark)
        case None => ev.filter(unix_timestamp(col("ts")) <= 1705276800L) // first chunk only
      }
    }))

  test("load order respects dependencies deterministically") {
    val order = Pipeline.loadOrder(specs)
    assert(order.indexOf("dim_customer") < order.indexOf("fact_events"))
    assert(order == Pipeline.loadOrder(specs), "stable ordering")
  }

  test("pre-season run loads dimensions; rerun is idempotent") {
    val (wh, md) = freshDirs()
    val runner = new PipelineRunner(spark, wh, new MetadataStore(spark, md), specs, extracts())
    val first = runner.run(Pipeline.PreSeason)
    assert(first("dim_customer") == Tables(spark, sfDir).customer.count())
    val second = runner.run(Pipeline.PreSeason, force = true)
    assert(second == first, "re-running must not duplicate rows")
  }

  test("post-race incremental run merges only past-watermark rows and upserts by key") {
    val (wh, md) = freshDirs()
    val store = new MetadataStore(spark, md)
    val runner = new PipelineRunner(spark, wh, store, specs, extracts())
    runner.run(Pipeline.PreSeason)

    val wm = 1705276800L // 2024-01-15
    val r1 = runner.run(Pipeline.PostRace, newWatermark = Some(wm))
    val expected1 = Tables(spark, sfDir).events.filter(unix_timestamp(col("ts")) <= wm).count()
    assert(r1("fact_events") == expected1)
    assert(store.watermark("fact_events").contains(wm))

    val r2 = runner.run(Pipeline.PostRace)
    val total = Tables(spark, sfDir).events.count()
    assert(r2("fact_events") == total, s"incremental merge should reach $total")
    // key uniqueness preserved (upsert, not append)
    val dupes = runner.table("fact_events").groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dupes == 0)
    // audit log recorded each run
    assert(store.history("fact_events").count(_.status == "success") == 2)
  }

  test("a failing run leaves the previous table generation intact (atomic publish)") {
    val (wh, md) = freshDirs()
    val store = new MetadataStore(spark, md)
    val okExtracts = extracts()
    val runner1 = new PipelineRunner(spark, wh, store, specs, okExtracts)
    runner1.run(Pipeline.PreSeason)
    val before = runner1.table("dim_customer").count()

    val poison: Map[String, Pipeline.Extract] = okExtracts.updated(
      "dim_customer", (s, _) => {
        import org.apache.spark.sql.functions.udf
        val boom = udf((x: Long) => { throw new RuntimeException("extract blew up"); x })
        Tables(s, sfDir).customer.withColumn("c_custkey", boom(org.apache.spark.sql.functions.col("c_custkey")))
      })
    val runner2 = new PipelineRunner(spark, wh, store, specs, poison)
    intercept[Exception] { runner2.run(Pipeline.PreSeason, force = true) }
    assert(runner1.table("dim_customer").count() == before, "old generation must survive the failed run")
    assert(store.history("dim_customer").last.status == "failed")
  }

  test("merge keeps the freshest version per key") {
    import spark.implicits._
    val old = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "ver")
    val fresh = Seq((2L, "B", 20L), (3L, "c", 5L)).toDF("id", "v", "ver")
    val merged = Pipeline.merge(Some(old), fresh, Seq("id"), Some("ver"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(merged.sameElements(Array((1L, "a"), (2L, "B"), (3L, "c"))))
  }

  test("csv-from-zip roundtrip with schema-driven sanitize (reference pre-season path)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("size", ShortType),
      StructField("active", BooleanType)))
    val zipPath = Files.createTempFile("graft_dump_", ".zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry("things.csv"))
    zos.write("id,name,size,active\n1,  alpha ,99999,true\n2,,-99999,f\n3,gamma,12,1\n".getBytes)
    zos.closeEntry(); zos.close()

    val dfs = CsvSource.fromZip(spark, zipPath.toString, Map("things.csv" -> schema))
    val clean = CsvSource.sanitize(dfs("things.csv"), schema).orderBy("id").collect()
    assert(clean.length == 3)
    assert(clean(0).getAs[String]("name") == "alpha", "trimmed")
    assert(clean(1).isNullAt(1), "empty string -> null")
    assert(clean(0).getAs[Short]("size") == 32767.toShort, "smallint clamp high")
    assert(clean(1).getAs[Short]("size") == -32768.toShort, "smallint clamp low")
    assert(clean(2).getAs[Boolean]("active"), "'1' -> true")
    assert(!clean(1).getAs[Boolean]("active"), "'f' -> false")
  }
}
