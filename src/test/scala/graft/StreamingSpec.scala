package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventPipelines

class StreamingSpec extends SparkSpecBase {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("st1 streaming windowed counts match the batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.windowedCountsStream(mem.toDF())
      .writeStream.format("memory").queryName("st1_out").outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts(5), 1, "click", 1.0),
        Ev(2, ts(20), 1, "click", 2.0),
        Ev(3, ts(40), 2, "view", 3.0))
      q.processAllAvailable()
      // advance event time beyond watermark so the 10:00 window finalizes
      mem.addData(Ev(4, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("st1_out").collect()
      val clicks = out.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2)
      assert(clicks.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("streaming windowed HLL distinct users equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.windowedDistinctUsersStream(mem.toDF())
      .writeStream.format("memory").queryName("hll_out").outputMode("append").start()
    try {
      // 40 events over 12 distinct users in the 10:00 window, split
      // across micro-batches so partial sketches must merge in state
      val evs = (1 to 40).map(i => Ev(i.toLong, ts(i % 50), i.toLong % 12, "click", 1.0))
      mem.addData(evs.take(15): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(15): _*)
      q.processAllAvailable()
      mem.addData(Ev(99, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("hll_out")
        .filter(col("window_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
        .collect()
      assert(out.length == 1)
      val streamed = out(0).getAs[Double]("est_users")
      val batch = evs.map(_.user_id).toDF("user_id")
        .agg(graft.functions.GraftFunctions.hll_distinct(col("user_id"), 8))
        .collect()(0).getDouble(0)
      assert(streamed == batch,
        s"stream ($streamed) and batch ($batch) sketches must agree bit-for-bit")
      assert(math.abs(streamed - 12) <= 2, s"estimate $streamed should be near 12 true users")
      assert(out(0).getAs[Long]("n") == 40)
    } finally q.stop()
  }

  test("streaming windowed CMS frequency sketch equals the batch plane byte-for-byte") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.windowedFreqSketchStream(mem.toDF())
      .writeStream.format("memory").queryName("cms_out").outputMode("append").start()
    try {
      // 30 events, user i%7, split across micro-batches so partial
      // planes must sum in state
      val evs = (1 to 30).map(i => Ev(i.toLong, ts(i % 50), i.toLong % 7, "click", 1.0))
      mem.addData(evs.take(11): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(11): _*)
      q.processAllAvailable()
      mem.addData(Ev(99, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("cms_out")
        .filter(col("window_start") === java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
        .collect()
      assert(out.length == 1)
      val streamed = out(0).getAs[Array[Byte]]("sk")
      val batch = evs.map(_.user_id).toDF("user_id")
        .agg(graft.functions.GraftFunctions.cms_sketch(col("user_id"), 4, 256))
        .collect()(0).getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(streamed, batch),
        "stream and batch counter planes must agree byte-for-byte")
      // probe a key after the fact: user 1 appears ceil(30/7)-ish times
      val truth = evs.count(_.user_id == 1L)
      assert(graft.functions.CmsWire.estimateLong(streamed, 1L) >= truth)
      assert(out(0).getAs[Long]("n") == 30)
    } finally q.stop()
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(1), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(3), 1, "click", 1.0)) // replay of id 1
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("st2 streaming sessionization closes a session after the gap times out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventPipelines.SessionEvent]
    val sessions = EventPipelines.sessionizeStream(mem.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("st2_out").outputMode("append").start()
    try {
      def at(minutes: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00").getTime + minutes * 60_000L)
      // two bursts 40 minutes apart -> first burst closes as its own session
      mem.addData(
        EventPipelines.SessionEvent(1, 1, at(0)),
        EventPipelines.SessionEvent(1, 2, at(5)))
      q.processAllAvailable()
      mem.addData(EventPipelines.SessionEvent(1, 3, at(45)))
      q.processAllAvailable()
      val out1 = spark.table("st2_out").collect()
      assert(out1.length == 1, s"expected the first session to close, got ${out1.length}")
      assert(out1.head.getAs[Long]("n_events") == 2)
      assert(out1.head.getAs[Long]("duration_sec") == 300)
      // a far-future event for ANOTHER user advances the watermark past the
      // 45min+gap deadline -> user 1's open session times out and flushes
      mem.addData(EventPipelines.SessionEvent(2, 4, at(300)))
      q.processAllAvailable()
      mem.addData(EventPipelines.SessionEvent(2, 5, at(301)))
      q.processAllAvailable()
      val out2 = spark.table("st2_out").collect()
      assert(out2.length == 2, s"expected the timed-out session to flush, got ${out2.length}")
      assert(out2.exists(r => r.getAs[Long]("user_id") == 1 && r.getAs[Long]("session_id") == 2))
    } finally q.stop()
  }

  test("streaming dedup runs on the RocksDB state store (production state backend)") {
    // at 100 TB/day rates keyed state outgrows executor heaps; RocksDB
    // spills it to local disk. This proves the pipelines run unchanged on
    // the production provider — per-query option, no session rebuild.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    // the provider is a session conf captured at query start (a
    // writeStream option of the same name is silently ignored)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = graft.streaming.EventPipelines.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("rocks_out").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(3, ts(2), 2, "click", 1.0)) // replay id=1
      q.processAllAvailable()
      val ids = spark.table("rocks_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
      // prove the provider actually switched: RocksDB checkpoints state
      // as zip snapshots/changelogs, the default HDFS provider as .delta
      val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt, "state"))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val names = scala.jdk.CollectionConverters.IteratorHasAsScala(stateFiles).asScala
        .map(_.getFileName.toString).toSeq
      assert(!names.exists(_.endsWith(".delta")),
        s"HDFS-provider .delta files present — RocksDB provider not engaged: $names")
      assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
        s"no RocksDB snapshot artifacts in checkpoint: $names")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming upsert sink merges micro-batches idempotently by key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("graft_upsert_").resolve("t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val mem = MemoryStream[Ev]
    val q = EventPipelines.upsertStream(mem.toDF(), target, ckpt)
    try {
      mem.addData(Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      // same key replayed with a newer ts -> overwrites, no duplicate
      mem.addData(Ev(1, ts(9), 1, "click", 9.0), Ev(3, ts(3), 2, "buy", 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(target).collect()
      assert(out.length == 3)
      val e1 = out.find(_.getAs[Long]("event_id") == 1).get
      assert(e1.getAs[Double]("value") == 9.0, "latest version wins")
    } finally q.stop()
  }

  test("streaming incremental rollup equals the batch rollup, bit-for-bit, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_roll_").resolve("t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rollck_").toString
    val mem = MemoryStream[Ev]
    val q = EventPipelines.incrementalRollupStream(mem.toDF(), root, ckpt)
    val fed = scala.collection.mutable.ListBuffer.empty[Ev]
    def feed(evs: Ev*): Unit = { fed ++= evs; mem.addData(evs: _*); q.processAllAvailable() }
    try {
      feed(Ev(1, ts(1), 1, "click", 1.5), Ev(2, ts(2), 2, "click", 2.5),
        Ev(3, ts(3), 1, "view", 4.0))
      feed(Ev(4, ts(4), 3, "click", 0.5), Ev(5, ts(5), 1, "view", 1.0))
      val streamed = EventPipelines.readRollup(spark, root).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      // batch twin over everything fed, through the SAME partials+merge
      // (q31's shape): must agree exactly, sketches included
      val all = fed.toSeq
        .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = EventPipelines.rollupPartials(all)
        .select(col("event_type"), col("n_events"),
          col("sum_v").cast("double").as("sum_value"),
          round(graft.functions.GraftFunctions.hll_estimate(col("sk")), 2).as("est_users"))
        .orderBy(col("event_type")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      assert(streamed == batch)
      assert(streamed.map(_._2).sum == fed.size.toLong, "every event counted once")
      // each refresh was a version: the pre-merge state is still readable
      val table = new graft.etl.SnapshotTable(spark, root)
      assert(table.currentVersion.exists(_ >= 1L), "two refreshes → two versions")
      val v0 = table.read(Some(0L)).agg(sum(col("n_events"))).collect()(0).getLong(0)
      assert(v0 == 3L, "time travel reads the first batch's state")
    } finally q.stop()
  }

  test("stream-stream attribution join matches purchases to in-window clicks only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventPipelines.attributionJoin(clicks.toDF(), purchases.toDF(), windowMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      clicks.addData(
        Ev(10, ts(0), 1, "click", 0),
        Ev(11, ts(50), 1, "click", 0), // out of window for the first purchase
        Ev(12, ts(5), 2, "click", 0))
      purchases.addData(
        Ev(20, ts(20), 1, "purchase", 9.99), // matches click 10 (20min gap)
        Ev(21, ts(55), 1, "purchase", 5.0))  // matches click 11 (5min), NOT 10 (55min)
      q.processAllAvailable()
      val out = spark.table("attr_out").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).sorted
      assert(out.toSeq == Seq((20L, 10L), (21L, 11L)), out.mkString(","))
    } finally q.stop()
  }

  test("document stream: exact dedup keeps first occurrence, quality scoring is stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String)
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocPipelines.qualityStream(
      graft.streaming.DocPipelines.exactDedupStream(docs))
      .writeStream.format("memory").queryName("docs_out").outputMode("append").start()
    try {
      mem.addData((1L, "hello world!"), (2L, "hello world!"), (3L, "unique doc here"))
      q.processAllAvailable()
      mem.addData((4L, "hello world!"), (5L, "another doc"))
      q.processAllAvailable()
      val out = spark.table("docs_out").collect()
      assert(out.length == 3, s"dup content must collapse, got ${out.length}")
      assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L, 5L))
      assert(out.forall(r => r.getAs[Long]("n_tokens") > 0))
    } finally q.stop()
  }

  test("streaming minhash dedup finds near-dups within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val nearDup = base.replace("tonight", "today") // one token differs
    val unrelated = "completely different words about spark shuffles and parquet row groups here now"
    val pairs = graft.streaming.DocPipelines.minhashDedupStream(mem.toDF().toDF("doc_id", "text"))
    val q = pairs.writeStream.format("memory").queryName("mh_out").outputMode("append").start()
    try {
      mem.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      assert(spark.table("mh_out").isEmpty, "no near-dups yet")
      mem.addData((3L, nearDup)) // cross-batch near-dup of doc 1
      q.processAllAvailable()
      val found = spark.table("mh_out").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct
      assert(found.contains((1L, 3L)), s"expected (1,3), got ${found.mkString(",")}")
      assert(!found.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not pair")
    } finally q.stop()
  }

  test("streaming minhash bucket state is evicted once the watermark passes its TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val dup1 = base.replace("tonight", "today")
    val dup2 = base.replace("home", "house")
    val far = "completely different words about spark shuffles and parquet row groups here now"
    val pairs = graft.streaming.DocPipelines.minhashDedupStream(
      mem.toDF().toDF("doc_id", "text", "ingest_ts"),
      watermarkCol = Some("ingest_ts"), delay = "10 minutes", ttlMinutes = 30)
    val q = pairs.writeStream.format("memory").queryName("mh_ttl_out").outputMode("append").start()
    try {
      mem.addData((1L, base, ts(0)))
      q.processAllAvailable()
      mem.addData((2L, dup1, ts(5))) // within TTL: pairs with doc 1
      q.processAllAvailable()
      val within = spark.table("mh_ttl_out").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct
      assert(within.contains((1L, 2L)), s"expected (1,2) within TTL, got ${within.mkString(",")}")

      // advance the watermark far past the buckets' 30-minute TTL
      mem.addData((3L, far, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // docs 1/2 are evicted: a fresh near-dup of them pairs with NOTHING
      mem.addData((4L, dup2, Timestamp.valueOf("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val after = spark.table("mh_ttl_out").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct
      assert(!after.exists(p => p._2 == 4L || p._1 == 4L),
        s"evicted members must not pair with later arrivals, got ${after.mkString(",")}")
    } finally q.stop()
  }

  test("a late in-watermark arrival does not shrink a minhash bucket's TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val dup1 = base.replace("tonight", "today")
    val dup2 = base.replace("home", "house")
    val far = "completely different words about spark shuffles and parquet row groups here now"
    def at(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    val pairs = graft.streaming.DocPipelines.minhashDedupStream(
      mem.toDF().toDF("doc_id", "text", "ingest_ts"),
      watermarkCol = Some("ingest_ts"), delay = "10 minutes", ttlMinutes = 60)
    val q = pairs.writeStream.format("memory").queryName("mh_late_out").outputMode("append").start()
    try {
      mem.addData((1L, base, at("12:00")))
      q.processAllAvailable()
      // LATE but within the watermark: must not pull the deadline below
      // newest-member (12:00) + 60min
      mem.addData((2L, dup1, at("11:55")))
      q.processAllAvailable()
      // watermark → 12:56: past 11:55+60min but NOT past 13:00
      mem.addData((3L, far, at("13:06")))
      q.processAllAvailable()
      mem.addData((4L, dup2, at("12:58")))
      q.processAllAvailable()
      val found = spark.table("mh_late_out").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).distinct
      assert(found.contains((1L, 4L)),
        s"bucket must survive to newest-member+TTL; got ${found.mkString(",")}")
    } finally q.stop()
  }

  test("streaming decontamination matches the batch dc1 operator, stateless in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val benchmark = t.documents.filter(col("doc_id") < 50)
    val corpusRows = t.documents.filter(col("doc_id") >= 50)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val flagged = graft.streaming.DocPipelines.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), benchmark)
    val q = flagged.writeStream.format("memory").queryName("dc_stream_out")
      .outputMode("append").start() // append works: no aggregation state
    try {
      val (first, second) = corpusRows.splitAt(corpusRows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("dc_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_shared").toLong).toMap
      val batch = graft.operators.Curation.decontaminate(t).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
      assert(streamed == batch, "stream and batch decontamination must agree")
    } finally q.stop()
  }

  test("streaming near-dup decontamination matches batch dc12 including the LSH gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val benchmark = t.documents.filter(col("doc_id") < 50)
    val corpusRows = t.documents.filter(col("doc_id") >= 50)
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val audited = graft.streaming.DocPipelines.neardupDecontaminateStream(
      mem.toDF().toDF("doc_id", "text"), benchmark)
    val q = audited.writeStream.format("memory").queryName("dc12_stream_out")
      .outputMode("append").start() // stateless: plan-literal benchmark, no aggregation
    try {
      val (first, second) = corpusRows.splitAt(corpusRows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("dc12_stream_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_bench"),
          r.getAs[Double]("est_jaccard"))).sortBy(_._1)
      val batch = graft.operators.Curation.neardupDecontaminate(t).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_bench"),
          r.getAs[Double]("est_jaccard"))).sortBy(_._1)
      assert(batch.nonEmpty && streamed.sameElements(batch),
        "stream and batch near-dup decontamination must agree row for row")
    } finally q.stop()
  }

  test("streaming sliding windows reproduce batch q32's trailing frames on the aligned grain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    def micros(x: Any): Long = x match {
      case ts: java.sql.Timestamp => ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
      case other => fail(s"unexpected timestamp type: $other")
    }
    val events = t.events.select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Ev(r.getAs[Long]("event_id"), new Timestamp(micros(r.getAs[Any]("ts")) / 1000),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val mem = MemoryStream[Ev]
    val q = EventPipelines.slidingWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("q32_stream_out").outputMode("append").start()
    try {
      mem.addData(events.toIndexedSeq)
      q.processAllAvailable()
      // far-future sentinel (own type) closes every real window
      val maxTs = events.map(_.ts.getTime).max
      mem.addData(Ev(-1L, new Timestamp(maxTs + 30L * 86400 * 1000), 0L, "__sentinel", 0.0))
      q.processAllAvailable()
      // keyed by the last day the window covers = win_end - 1 day
      val streamed = spark.table("q32_stream_out").collect()
        .filter(_.getAs[String]("event_type") != "__sentinel")
        .map { r =>
          val endMs = micros(r.getAs[Any]("win_end")) / 1000
          ((r.getAs[String]("event_type"),
            java.time.Instant.ofEpochMilli(endMs).minus(java.time.Duration.ofDays(1))
              .toString.take(10)),
            (r.getAs[Long]("win_events"), r.getAs[Double]("win_value")))
        }.toMap
      val batch = graft.operators.Relational.movingWindow(t).collect()
        .map(r => ((r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString),
          (r.getAs[Long]("win_events"), r.getAs[Double]("win_value"))))
      assert(batch.nonEmpty)
      // every batch day-with-events must appear as the window ending the
      // next day with identical totals (the stream also emits windows for
      // event-less tail days inside a 7-day reach — a superset by design)
      batch.foreach { case (key, v) =>
        assert(streamed.get(key).contains(v),
          s"window for $key: stream=${streamed.get(key)} batch=$v")
      }
    } finally q.stop()
  }

  test("streaming attribution: 16 bytes of state per user reproduce batch q34 exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    def micros(x: Any): Long = x match {
      case ts: java.sql.Timestamp => ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
      case other => fail(s"unexpected timestamp type: $other")
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(us / 1000000L * 1000L)
      ts.setNanos((us % 1000000L).toInt * 1000) // keep full microsecond precision
      ts
    }
    val events = t.events.select("user_id", "event_id", "ts", "event_type", "value").collect()
      .map(r => graft.streaming.EventPipelines.ClickEvent(
        r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        toTs(micros(r.getAs[Any]("ts"))), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
      .sortBy(e => (micros(e.ts), e.event_id))
    val mem = MemoryStream[graft.streaming.EventPipelines.ClickEvent]
    val out = graft.streaming.EventPipelines.attributionStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("attr_stream_out")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      def r2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val streamed = spark.table("attr_stream_out").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          Option(r.getAs[Any]("click_id")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("gap_us")).map(_.asInstanceOf[Long]),
          r2(r.getAs[Double]("value")))).toSet
      val batch = graft.operators.Relational.q34Attribution(t).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          Option(r.getAs[Any]("click_id")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("gap_us")).map(_.asInstanceOf[Long]),
          r.getAs[Double]("value"))).toSet
      assert(batch.nonEmpty && streamed == batch,
        "streamed attributions must equal the batch as-of join row for row")
    } finally q.stop()
  }

  test("streaming SCD2 maintenance: closed intervals equal batch q33's across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    def millis(x: Any): Long = x match {
      case ts: java.sql.Timestamp => ts.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected timestamp type: $other")
    }
    // feed in global (ts, event_id) order so each user's events arrive
    // in order across the two micro-batches (the documented contract)
    val events = t.events.select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => graft.streaming.EventPipelines.StateEvent(
        r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        new java.sql.Timestamp(millis(r.getAs[Any]("ts"))), r.getAs[String]("event_type")))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[graft.streaming.EventPipelines.StateEvent]
    val out = graft.streaming.EventPipelines.scd2Stream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("scd2_stream_out")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("scd2_stream_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq"),
          r.getAs[String]("event_type"), r.getAs[Long]("valid_from_ms"),
          r.getAs[Long]("valid_to_ms"))).toSet
      val batch = graft.operators.Relational.scd2(t).collect()
        .filter(_.getAs[Any]("valid_to") != null)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq"),
          r.getAs[String]("event_type"), millis(r.getAs[Any]("valid_from")),
          millis(r.getAs[Any]("valid_to")))).toSet
      assert(batch.nonEmpty && streamed == batch,
        "streamed closed intervals must equal the batch history's closed rows")
    } finally q.stop()
  }

  test("streaming boilerplate scoring matches batch d13 against the same hot set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val k = 3
    // pin the hot set exactly as batch d13 derives it (df >= 5)
    val hot: Seq[Long] = t.documents
      .select(col("doc_id"), graft.functions.GraftFunctions.ws_tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.GraftFunctions.shingle_hashes(col("toks"), k))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5)
      .select("h").collect().map(_.getLong(0)).toSeq
    val docRows = t.documents.select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val scored = graft.streaming.DocPipelines.boilerplateScoreStream(
      mem.toDF().toDF("doc_id", "text"), hot, k)
    val q = scored.writeStream.format("memory").queryName("d13_stream_out")
      .outputMode("append").start()
    try {
      val (first, second) = docRows.splitAt(docRows.length / 2)
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("d13_stream_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
          r.getAs[Long]("bp_tokens"), r.getAs[Double]("bp_frac"))).sortBy(_._1)
      val batch = graft.operators.Dedup.boilerplate(t).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
          r.getAs[Long]("bp_tokens"), r.getAs[Double]("bp_frac"))).sortBy(_._1)
      assert(batch.exists(_._3 > 0) && streamed.sameElements(batch),
        "stream and batch boilerplate scoring must agree row for row")
    } finally q.stop()
  }

  test("streaming unigram logprob matches batch t8 against the same frequency snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    // pin the snapshot from the same corpus batch t8 derives its
    // frequencies from, so every token is known and scores must agree
    val tokens = t.documents
      .select(explode(graft.functions.GraftFunctions.ws_tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "").groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = tokens.map(_._2).sum.toDouble
    val vocab = tokens.map { case (tok, n) => tok -> math.log(n / total) }.toMap

    val docs = t.documents.select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val scored = graft.streaming.DocPipelines.unigramLogprobStream(
      mem.toDF().toDF("doc_id", "text"), vocab)
    val q = scored.writeStream.format("memory").queryName("lp_stream_out")
      .outputMode("append").start() // stateless: per-doc, no aggregation state
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("lp_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob")))).toMap
      val batch = graft.operators.TextAnalysis.unigramLogprob(t).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob")))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, (n, lp)) =>
        assert(n == batch(id)._1, s"token count mismatch for doc $id")
        // batch accumulates tf·lp per distinct token, the stream adds lp
        // per occurrence — one rounding step of float slack at the edge
        assert(math.abs(lp - batch(id)._2) <= 2e-6,
          s"doc $id: stream $lp vs batch ${batch(id)._2}")
      }
    } finally q.stop()
  }

  test("streaming URL dedup keeps the first arrival per canonical key, like batch d11's keeper") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three canonical groups dressed in crawl noise; arrival in id order
    val recs = Seq(
      (1L, "https://a.com/p?x=1&utm_source=f"),
      (2L, "HTTPS://WWW.A.com:443/p/?x=1#frag"), // same page as 1
      (3L, "https://b.com/q?z=2&y=1"),
      (4L, "https://b.com/q?y=1&z=2"), // same page as 3
      (5L, "http://c.com/r"))
    val mem = MemoryStream[(Long, String)]
    val dedup = graft.streaming.DocPipelines.urlDedupStream(
      mem.toDF().toDF("rec_id", "url"))
    val q = dedup.writeStream.format("memory").queryName("url_stream_out")
      .outputMode("append").start()
    try {
      mem.addData(recs.take(3)); q.processAllAvailable()
      mem.addData(recs.drop(3)); q.processAllAvailable()
      val kept = spark.table("url_stream_out").collect()
        .map(r => (r.getAs[String]("canon_url"), r.getAs[Long]("rec_id"))).toMap
      // first arrival (= lowest id here) wins per canonical key — the
      // batch keeper rule under id-ordered arrival
      assert(kept == Map(
        "https://a.com/p?x=1" -> 1L,
        "https://b.com/q?y=1&z=2" -> 3L,
        "http://c.com/r" -> 5L))
    } finally q.stop()
  }

  test("streaming DSIR scoring equals batch t11 against the same pinned λ model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    // the model: the previous corpus generation's λ, built batch-side
    val lam = graft.operators.TextAnalysis.dsirLambda(t.documents)
    val docs = t.documents.filter(col("doc_id") >= 50)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val scored = graft.streaming.DocPipelines.dsirScoreStream(
      mem.toDF().toDF("doc_id", "text"), lam)
    val q = scored.writeStream.format("memory").queryName("dsir_stream_out")
      .outputMode("append").start() // stateless: per-doc projection, no state
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("dsir_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight")))).toMap
      val batch = graft.operators.TextAnalysis.dsirScore(
          t.documents.filter(col("doc_id") >= 50), lam).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight")))).toMap
      // the twin IS the batch scorer minus the sort: exact equality
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming PII scrub matches the batch t9 redactor, stateless in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "mail a@b.io and call 555-123-4567"),
      (2L, "host 10.0.0.7 clean otherwise"),
      (3L, "nothing sensitive at all"))
    val mem = MemoryStream[(Long, String)]
    val scrubbed = graft.streaming.DocPipelines.piiScrubStream(
      mem.toDF().toDF("doc_id", "text"))
    val q = scrubbed.writeStream.format("memory").queryName("pii_stream_out")
      .outputMode("append").start() // stateless: append needs no watermark
    try {
      mem.addData(docs.take(2)); q.processAllAvailable()
      mem.addData(docs.drop(2)); q.processAllAvailable()
      val streamed = spark.table("pii_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
            r.getAs[Long]("n_ips"), r.getAs[String]("redacted")))).toMap
      val batch = graft.operators.TextAnalysis.piiRedact(
          docs.toDF("doc_id", "text"), col("text")).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
            r.getAs[Long]("n_ips"), r.getAs[String]("redacted")))).toMap
      assert(streamed == batch, "stream and batch PII scrubbing must agree")
      assert(streamed(1L)._4 == "mail <EMAIL> and call <PHONE>")
    } finally q.stop()
  }

  test("streaming substring dedup probes the persisted store and equals batch d10 on the same increment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    graft.sources.Warehouse.dropStore(spark, "substream", Seq("shingles"))
    graft.operators.Dedup.buildSubstringStore(
      t.documents.filter(col("doc_id") < 250), "substream")
    val increment = t.documents.filter(col("doc_id") >= 250)
      .select("doc_id", "text").as[(Long, String)].collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Int]("start_new"), r.getAs[Int]("start_old"),
        r.getAs[Long]("span_tokens"))
    val got = scala.collection.mutable.Set.empty[(Long, Long, Int, Int, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.substringDedupStream(
        mem.toDF().toDF("doc_id", "text"), "substream",
        (spans, _) => got ++= spans.collect().map(key))
      .start()
    try {
      // two micro-batches: the probe is one-sided (batch vs store), so
      // the union over micro-batches must equal the one-shot batch probe
      val (first, second) = increment.splitAt(increment.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val want = graft.operators.Dedup.substringSpansIncremental(t, 250)
        .collect().map(key).toSet
      assert(got.toSet == want, s"stream probe diverged from batch d10: got $got want $want")
      assert(got.nonEmpty, "the sf0.001 corpus has cross-split duplicated spans")
    } finally q.stop()
  }

  test("streaming rewrite ingest cleans each micro-batch like batch d21, including a span-free batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    graft.sources.Warehouse.dropStore(spark, "rwstream", Seq("shingles"))
    graft.operators.Dedup.buildSubstringStore(
      t.documents.filter(col("doc_id") < 250), "rwstream")
    val increment = t.documents.filter(col("doc_id") >= 250)
      .select("doc_id", "text").as[(Long, String)].collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Int]("removed_tokens"), r.getAs[String]("text"))
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Int, Int, String)]]
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.rewriteIngestStream(
        mem.toDF().toDF("doc_id", "text"), "rwstream",
        (rw, id) => perBatch(id) = rw.collect().map(key).toSet)
      .start()
    try {
      // batch 0: real corpus docs (some carry cut spans); batch 1: an
      // ALL-NOVEL batch sharing nothing ≥ minSpan with the store — it
      // must pass through splice-free with removed_tokens = 0
      val novel = (9000L to 9004L).map(i =>
        (i, (0 until 30).map(j => s"nv${i}x$j").mkString(" ")))
      mem.addData(increment.toIndexedSeq); q.processAllAvailable()
      mem.addData(novel); q.processAllAvailable()
      // streamed ≡ batch d21, row for row, per micro-batch
      def want(rows: Seq[(Long, String)]) =
        graft.operators.Dedup.substringRewriteAgainstStore(
            "rwstream", rows.toDF("doc_id", "text"))
          .collect().map(key).toSet
      assert(perBatch(0L) == want(increment.toSeq),
        "streamed rewrite diverged from batch d21 on the real increment")
      assert(perBatch(0L).exists(_._3 > 0),
        "the sf0.001 increment carries at least one cut span")
      assert(perBatch(1L) == want(novel),
        "streamed rewrite diverged from batch d21 on the novel batch")
      assert(perBatch(1L).forall(r => r._3 == 0 && r._2 == 30),
        "an all-novel batch passes through splice-free")
    } finally q.stop()
    graft.sources.Warehouse.dropStore(spark, "rwstream", Seq("shingles"))
  }

  test("streaming KL drift scores each micro-batch against the pinned reference like batch t19") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val (refCounts, refTotal) = graft.operators.TextAnalysis.klReferenceModel(t)
    val rows = t.documents.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()

    val perBatch = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long, Double)]]
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocPipelines.klDriftStream(
        mem.toDF().toDF("doc_id", "source", "text"), refCounts, refTotal,
        (drift, id) => perBatch(id) = drift.collect()
          .map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_tokens"),
              r.getAs[Double]("kl_vs_ref")))).toMap)
      .start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      // drift is per-BATCH by design: each emitted frame must equal the
      // batch scorer run on exactly that micro-batch's rows
      def want(part: Array[(Long, String, String)]) =
        graft.operators.TextAnalysis.klDriftAgainst(
            part.toSeq.toDF("doc_id", "source", "text"), refCounts, refTotal)
          .collect().map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_tokens"),
              r.getAs[Double]("kl_vs_ref")))).toMap
      assert(perBatch(0L) == want(first), "batch 0 drift equals the batch scorer")
      assert(perBatch(1L) == want(second), "batch 1 drift equals the batch scorer")
    } finally q.stop()
  }

  test("streaming novelty scoring probes the persisted store and equals the batch probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    graft.sources.Warehouse.dropStore(spark, "novstream", Seq("shdf"))
    graft.operators.Dedup.buildNoveltyStore(
      t.documents.filter(col("doc_id") < 250), "novstream")
    val increment = t.documents.filter(col("doc_id") >= 250)
      .select("doc_id", "text").as[(Long, String)].collect()

    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, Double)]
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.noveltyScoreStream(
        mem.toDF().toDF("doc_id", "text"), "novstream",
        (scores, _) => got ++= scores.collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))))
      .start()
    try {
      // per-doc scoring is batch-independent, so the union over two
      // micro-batches must equal the one-shot batch probe
      val (first, second) = increment.splitAt(increment.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val want = graft.operators.Dedup.noveltyAgainstStore(
          "novstream", t.documents.filter(col("doc_id") >= 250)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got.toMap == want, "stream novelty diverged from the batch probe")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming BPE encode probes the dict store and equals the batch encode, OOV included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    graft.sources.Warehouse.dropStore(spark, "bpestream", Seq("dict", "merges"))
    graft.operators.Bpe.buildDictStore(t, "bpestream")

    // two real docs plus one the tokenizer never saw (the OOV fallback
    // must behave identically through the stream)
    val docs: Seq[(Long, String)] = t.documents.filter(col("doc_id") < 2)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq :+
      ((9999L, "zzqx zzqx the"))
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.bpeEncodeStream(
        mem.toDF().toDF("doc_id", "text"), "bpestream",
        (counts, _) => counts.collect().foreach(r =>
          got(r.getLong(0)) = (r.getLong(1), r.getLong(2))))
      .start()
    try {
      val (first, second) = docs.splitAt(2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val want = graft.operators.Bpe.encodeDocsAgainstStore(
          docs.toDF("doc_id", "text"), "bpestream")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.toMap == want, s"stream encode diverged: got $got want $want")
      assert(got.contains(9999L), "the all-batch-side OOV doc must be encoded, not dropped")
    } finally q.stop()
  }

  test("streaming IVF probe equals the batch index search on the same query set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_stream_").resolve("idx").toString
    graft.operators.Similarity.buildIvfIndex(t, path)
    val queries = t.embeddings.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))
    val got = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.DocPipelines.ivfProbeStream(
        mem.toDF().toDF("vec_id", "embedding"), path,
        (hits, _) => got ++= hits.collect().map(key))
      .start()
    try {
      // two micro-batches over the same published generation must union
      // to exactly the one-shot batch probe of those 10 queries
      val (first, second) = queries.splitAt(5)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val want = graft.operators.Similarity.searchIvfIndex(t, path)
        .collect().map(key).toSet
      assert(got.toSet == want, "stream probe diverged from batch index search")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming BM25 ingest: each micro-batch publishes a segment; the store equals a one-shot build after every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    val t = graft.sources.Tables(spark, sfDir)
    val half = t.documents.count() / 2
    graft.sources.Warehouse.dropStore(spark, "bm25ing", Seq("postings", "stats"))
    TextAnalysis.buildBm25Store(t.documents.filter(col("doc_id") < half), "bm25ing", buckets = 8)
    val arrivals = t.documents.filter(col("doc_id") >= half)
      .select("doc_id", "text").as[(Long, String)].collect()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.bm25IngestStream(
      mem.toDF().toDF("doc_id", "text"), "bm25ing").start()
    try {
      val (first, second) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      // after the first batch the store must equal a one-shot build over
      // base + first batch — the mid-stream prefix is already consistent
      val ids = first.map(_._1).toSet
      graft.sources.Warehouse.dropStore(spark, "bm25ing_ref", Seq("postings", "stats"))
      TextAnalysis.buildBm25Store(
        t.documents.filter(col("doc_id") < half || col("doc_id").isin(ids.toSeq: _*)),
        "bm25ing_ref", buckets = 8)
      assert(key(TextAnalysis.bm25AgainstStore(spark, "bm25ing")) ==
        key(TextAnalysis.bm25AgainstStore(spark, "bm25ing_ref")),
        "mid-stream store must equal a one-shot build over everything ingested so far")
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      assert(key(TextAnalysis.bm25AgainstStore(spark, "bm25ing")) ==
        key(TextAnalysis.bm25(t)),
        "after the full stream the store must equal in-job t17 over the whole corpus")
    } finally q.stop()
    graft.sources.Warehouse.dropStore(spark, "bm25ing", Seq("postings", "stats"))
    graft.sources.Warehouse.dropStore(spark, "bm25ing_ref", Seq("postings", "stats"))
  }

  test("streaming BM25 ingest survives a mid-stream rebuild: committed batches never replay, later batches append to the new base") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextAnalysis
    import graft.sources.Warehouse
    val t = graft.sources.Tables(spark, sfDir)
    val half = t.documents.count() / 2
    Warehouse.dropStore(spark, "bm25reb", Seq("postings", "stats"))
    TextAnalysis.buildBm25Store(t.documents.filter(col("doc_id") < half), "bm25reb", buckets = 8)
    val arrivals = t.documents.filter(col("doc_id") >= half)
      .select("doc_id", "text").as[(Long, String)].collect()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.bm25IngestStream(
      mem.toDF().toDF("doc_id", "text"), "bm25reb").start()
    try {
      val (first, second) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()

      // the production maintenance cycle: a REBUILD over everything
      // ingested so far publishes mid-stream, superseding the segment
      val firstIds = first.map(_._1).toSet
      TextAnalysis.buildBm25Store(
        t.documents.filter(col("doc_id") < half || col("doc_id").isin(firstIds.toSeq: _*)),
        "bm25reb", buckets = 8)

      // batch 0 committed BEFORE the rebuild (appender-confirmed tag) —
      // an at-least-once replay arriving AFTER the rebuild must skip,
      // even though its segment is now superseded
      assert(TextAnalysis.appendToBm25Store(
        first.toSeq.toDF("doc_id", "text"), "bm25reb",
        dedupeTag = Some("bm25-ingest:0")).isEmpty,
        "a committed batch must never re-append across a rebuild")

      // the stream continues: the next micro-batch appends as a segment
      // of the NEW base, and the store equals in-job t17 over everything
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val (base, segs) = Warehouse.resolveSegmented(spark, "bm25reb")
      assert(base == 3L && segs == Seq(4L),
        s"the post-rebuild batch must land as a segment of the rebuilt base, got ($base, $segs)")
      assert(key(TextAnalysis.bm25AgainstStore(spark, "bm25reb")) == key(TextAnalysis.bm25(t)),
        "after rebuild + continued ingest the store equals the one-shot over the whole corpus")
    } finally q.stop()
    Warehouse.dropStore(spark, "bm25reb", Seq("postings", "stats"))
  }

  test("streaming IVF ingest: appended segments become probe-visible per batch, equal to batch appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    val t = graft.sources.Tables(spark, sfDir)
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val half = emb.count() / 2
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_ing_").resolve("idx").toString
    Similarity.buildIvfIndexOf(emb.filter(col("vec_id") < half), path)
    val arrivals = emb.filter(col("vec_id") >= half)
      .as[(Long, Array[Float])].collect()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.DocPipelines.ivfIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), path).start()
    try {
      val (first, second) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      // two streamed segments ≡ the same rows appended in one batch call
      // (segment-batching invariance, proven against a fresh twin index)
      val twin = java.nio.file.Files.createTempDirectory("graft_ivf_ing2_").resolve("idx").toString
      Similarity.buildIvfIndexOf(emb.filter(col("vec_id") < half), twin)
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= half), twin)
      assert(key(Similarity.searchIvfIndex(t, path)) == key(Similarity.searchIvfIndex(t, twin)),
        "streamed segments must probe identically to a batch append of the same rows")
      assert(key(Similarity.searchIvfIndex(t, path)).exists(_._3 >= half),
        "streamed vectors must be reachable")

      // mid-stream rebuild (the s11 maintenance cycle, BM25's twin test):
      // a rebuild over everything ingested so far supersedes the streamed
      // segments; a replay of a committed batch still skips, and the
      // probe reads the rebuilt base alone
      Similarity.buildIvfIndexOf(emb, path)
      assert(Similarity.appendToIvfIndex(
        first.toSeq.toDF("vec_id", "embedding"), path,
        dedupeTag = Some("ivf-ingest:0")).isEmpty,
        "a committed vector batch must never re-append across a rebuild")
      val rebuilt = java.nio.file.Files.createTempDirectory("graft_ivf_ing3_").resolve("idx").toString
      Similarity.buildIvfIndexOf(emb, rebuilt)
      assert(key(Similarity.searchIvfIndex(t, path)) == key(Similarity.searchIvfIndex(t, rebuilt)),
        "after the rebuild the probe reads the full-corpus base alone")
    } finally q.stop()
  }

  test("streaming sequence packing equals batch p1 on a single batch and appends across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val docs = t.documents.select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.sequencePackStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pack_out").outputMode("append").start()
    try {
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("ws_tokens"),
          r.getAs[Long]("start_tok"), r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last"))
      // one batch holding the whole corpus = the batch layout exactly
      mem.addData(docs.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("pack_out").collect().map(key).toSet
      val want = graft.operators.Packing.sequencePack(t).collect().map(key).toSet
      assert(got == want, "single-batch stream must reproduce the batch manifest")
      // a second batch appends at each shard's tail: offsets continue
      val tails = spark.table("pack_out").collect()
        .groupBy(_.getAs[Int]("shard"))
        .map { case (sh, rs) =>
          sh -> rs.map(r => r.getAs[Long]("start_tok") + r.getAs[Long]("ws_tokens")).max }
      mem.addData((900001L, "alpha beta gamma delta"), (900002L, "epsilon zeta eta theta"))
      q.processAllAvailable()
      val late = spark.table("pack_out").collect()
        .filter(_.getAs[Long]("doc_id") > 900000L)
      assert(late.length == 2)
      late.foreach { r =>
        assert(r.getAs[Long]("start_tok") == tails.getOrElse(r.getAs[Int]("shard"), 0L),
          "late arrival must pack at its shard's tail")
      }
    } finally q.stop()
  }

  test("st2 batch twin: session count equals gap-break count") {
    val t = graft.sources.Tables(spark, sfDir)
    val sessions = EventPipelines.sessionizeBatch(t)
    val nSessions = sessions.count()
    val nUsers = t.events.select(col("user_id")).distinct().count()
    assert(nSessions >= nUsers, "each user has at least one session")
    assert(sessions.filter(col("duration_sec") < 0).count() == 0)
  }

  test("streaming BM25 scoring is bit-equal to batch t17 under a pinned model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.sources.Tables(spark, sfDir)
    val terms = graft.operators.TextAnalysis.Bm25QueryTerms
    // pin the model EXACTLY as batch computes it: df per term (doc
    // frequency), corpus size, mean token length via sum(dl)/count
    val toks = graft.functions.GraftFunctions.ws_tokens(col("text"))
    val base = t.documents.select(col("doc_id"),
      size(toks).cast("double").as("dl"), col("text"))
    val statsRow = base.agg(count(lit(1)).cast("double"),
      sum(col("dl")) / count(lit(1))).collect()(0)
    val (nDocs, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val termDf = terms.map { term =>
      term -> base.filter(
        size(filter(toks, x => x === lit(term))) > 0).count().toDouble
    }
    val docs = t.documents.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val scored = graft.streaming.DocPipelines.bm25ScoreStream(
      mem.toDF().toDF("doc_id", "text"), termDf, nDocs, avgdl)
    val q = scored.writeStream.format("memory").queryName("bm25_stream_out")
      .outputMode("append").start() // stateless: per-doc projection
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toIndexedSeq); q.processAllAvailable()
      mem.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("bm25_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      val batch = graft.operators.TextAnalysis.bm25(t, terms, topK = Int.MaxValue)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(streamed == batch, "streamed scores bit-equal batch BM25 on every hit doc")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming cluster maintenance (d19 twin): multi-batch ingest with a cluster-merge batch equals the one-shot recompute; replays converge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    import graft.sources.Warehouse
    // the crafted merge corpus (WarehouseSpec's): two separate clusters,
    // then a bridge doc whose arrival must MERGE them — streamed
    val c1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c2 = "one two three four five six seven eight nine ten"
    val base = Seq((0L, c1), (1L, c1 + " extra"), (2L, c2), (3L, c2 + " more"))
      .toDF("doc_id", "text")
    val batch1 = Seq((5L, c1 + " also")) // joins cluster {0,1}
    val batch2 = Seq((4L, c1 + " " + c2)) // the bridge: merges everything
    Warehouse.dropStore(spark, "d19st_sigs", Seq("bands", "sigs"))
    Warehouse.dropStore(spark, "d19st_cl", Seq("labels"))
    Dedup.buildSignatureStore(base, "d19st_sigs", bands = 32, maxBandBucket = None)
    Dedup.buildClusterStore(base, "d19st_cl", bands = 32, threshold = 0.3)

    def labels(): Seq[(Long, Long)] = {
      val g = Warehouse.resolveGeneration(spark, "d19st_cl")
      Warehouse.table(spark, Warehouse.storeTableName("d19st_cl", g, "labels"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSeq
    }
    def oneShot(docs: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      Dedup.clustersOfPairs(
        Dedup.minhashPairsOf(docs, bands = 32, threshold = 0.3)
          .select(col("doc_a"), col("doc_b")))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocPipelines.clusterMaintainStream(
      mem.toDF().toDF("doc_id", "text"), "d19st_cl", "d19st_sigs",
      bands = 32, threshold = 0.3).start()
    try {
      mem.addData(batch1.toIndexedSeq); q.processAllAvailable()
      val all1 = base.unionByName(batch1.toDF("doc_id", "text"))
      assert(labels() == oneShot(all1),
        "after batch 1 the store equals the one-shot recompute over everything so far")
      assert(labels().map(_._2).distinct.sorted == Seq(0L, 2L),
        "precondition holds mid-stream: still two separate clusters")

      mem.addData(batch2.toIndexedSeq); q.processAllAvailable()
      val all2 = all1.unionByName(batch2.toDF("doc_id", "text"))
      val fin = labels()
      assert(fin == oneShot(all2),
        "the bridge batch merges and relabels to the one-shot recompute's labels")
      assert(fin.nonEmpty && fin.map(_._2).distinct == Seq(0L),
        "everything merged into one cluster")

      // the stream ingested each batch as an O(batch) SEGMENT of the
      // signature store (never an O(corpus) rewrite)
      val (sb, ss) = Warehouse.resolveSegmented(spark, "d19st_sigs")
      assert(ss.size == 2, s"each micro-batch lands as one segment, got $ss")
      def sigCount(): Long = (sb +: Warehouse.resolveSegmented(spark, "d19st_sigs")._2)
        .map(g => Warehouse.table(spark,
          Warehouse.storeTableName("d19st_sigs", g, "sigs")).count()).sum
      assert(sigCount() == 6, "base 4 docs + two 1-doc segments")

      // at-least-once convergence: re-running the whole absorb for an
      // already-processed batch (the crash-recovery replay shape) must
      // change NOTHING — maintenance is a fixed point, the publish is
      // content-identical, and the signature segment's committed tag
      // makes the replay SKIP instead of double-appending
      val replayed = Dedup.maintainClustersAgainstStore(
        "d19st_cl", "d19st_sigs", batch2.toDF("doc_id", "text"),
        bands = 32, threshold = 0.3)
      Dedup.publishMaintainedClusters(replayed, "d19st_cl")
      assert(Dedup.appendToSignatureStore(batch2.toDF("doc_id", "text"), "d19st_sigs",
        dedupeTag = Some("cluster-maintain:1")).isEmpty,
        "a committed batch's signature segment must never re-append")
      assert(labels() == fin, "a replayed batch converges to the same labeling")
      assert(sigCount() == 6, "a replayed signature absorb never duplicates rows")

      // COMPACTION: growSignatureStore folds base + segments into the
      // next full build (re-absorbing batch2 — doc_id-deduped, so the
      // fold is replay-safe too); probes and maintenance see the same
      // corpus, segments become vacuum-reclaimable
      Dedup.growSignatureStore(batch2.toDF("doc_id", "text"), "d19st_sigs")
      val (cb, cs) = Warehouse.resolveSegmented(spark, "d19st_sigs")
      assert(cs.isEmpty && cb > sb, "the fold publishes a full build that supersedes the segments")
      assert(Warehouse.table(spark,
        Warehouse.storeTableName("d19st_sigs", cb, "sigs")).count() == 6,
        "the folded build holds every doc exactly once")
      val afterFold = Dedup.maintainClustersAgainstStore(
        "d19st_cl", "d19st_sigs", Seq.empty[(Long, String)].toDF("doc_id", "text"),
        bands = 32, threshold = 0.3)
      assert(afterFold.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == fin,
        "maintenance over the folded store reads the same corpus")
    } finally q.stop()
    Warehouse.dropStore(spark, "d19st_sigs", Seq("bands", "sigs"))
    Warehouse.dropStore(spark, "d19st_cl", Seq("labels"))
  }
}
