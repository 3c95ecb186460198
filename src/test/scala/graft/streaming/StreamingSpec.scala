package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming execution tests (SURVEY.md §2.9): the same transforms the
  * oracle checks in batch (StreamAnalogQueries) run here as real streams,
  * asserting stream-vs-batch equivalence, watermark late-drop, stateful
  * dedup, and the foreachBatch incremental upsert.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val staticEvents = Seq(
    (1L, "click", ts(0), 1.0),
    (1L, "click", ts(2), 2.0),
    (2L, "view", ts(4), 3.0),
    (2L, "click", ts(6), 4.0),
    (1L, "view", ts(11), 5.0),
    (3L, "click", ts(13), 6.0)
  ).toDF("user_id", "event_type", "ts", "value")

  private def runStream[T](stream: MemoryStream[T], data: Seq[T],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "complete"): org.apache.spark.sql.DataFrame = {
    val name = s"mem_${System.nanoTime()}"
    val q = transform(stream.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    stream.addData(data: _*)
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("T2 tumbling: stream result equals batch result on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp, Double)]
    val rows = staticEvents.as[(Long, String, Timestamp, Double)].collect().toSeq
    val got = runStream[(Long, String, Timestamp, Double)](
      stream, rows,
      df => Streams.tumblingCounts(
        df.toDF("user_id", "event_type", "ts", "value")))
      .orderBy("w_start", "event_type").collect()
    val want = Streams.tumblingCounts(staticEvents)
      .orderBy("w_start", "event_type").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("T4 sessions: stream sessionization equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp, Double)]
    val rows = staticEvents.as[(Long, String, Timestamp, Double)].collect().toSeq
    val got = runStream[(Long, String, Timestamp, Double)](
      stream, rows,
      df => Streams.sessionCounts(
        df.toDF("user_id", "event_type", "ts", "value"), gap = "5 minutes"))
      .orderBy("user_id", "s_start").collect()
    val want = Streams.sessionCounts(staticEvents, gap = "5 minutes")
      .orderBy("user_id", "s_start").collect()
    assert(got.toSeq == want.toSeq)
    // user 1: events at 10:00,10:02 (one session) and 10:11 (another)
    assert(got.count(_.getLong(2) == 1L) == 2)
  }

  test("T5 watermark: events later than the horizon are dropped from state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp, Double)]
    val name = s"mem_${System.nanoTime()}"
    val q = Streams.watermarkedCounts(
        stream.toDF().toDF("user_id", "event_type", "ts", "value"),
        lateness = "5 minutes", width = "5 minutes")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    // batch 1: event at 10:30 → watermark advances to 10:25
    stream.addData((1L, "click", ts(30), 1.0))
    q.processAllAvailable()
    // batch 2: a very late event at 10:00 (window end 10:05 < watermark) is
    // dropped; a fresh event at 10:31 is kept
    stream.addData((1L, "click", ts(0), 9.0), (1L, "click", ts(31), 2.0))
    q.processAllAvailable()
    q.stop()
    val buckets = spark.table(name).select("w_start").distinct().as[Timestamp].collect()
    assert(buckets.forall(_.toString >= "2024-01-01 10:30:00.0"), buckets.mkString(","))
  }

  test("T6 stateful dedup: duplicate (user,type,ts) rows collapse") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp, Double)]
    val dup = (1L, "click", ts(1), 1.0)
    val got = runStream[(Long, String, Timestamp, Double)](
      stream, Seq(dup, dup, dup, (2L, "view", ts(2), 2.0)),
      df => Streams.dedupedEvents(df.toDF("user_id", "event_type", "ts", "value")),
      mode = "append")
    assert(got.count() == 2)
  }

  test("T7 incremental upsert: micro-batches merge last-wins into the store") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_store").toString + "/nodes"
    val stream = MemoryStream[(Long, String, Timestamp, Double)]
    val q = Streams.incrementalUpsert(
      stream.toDF().toDF("user_id", "event_type", "ts", "value"),
      spark, store, keyCol = "user_id").start()
    stream.addData((1L, "click", ts(0), 1.0), (2L, "view", ts(1), 2.0))
    q.processAllAvailable()
    stream.addData((1L, "upgrade", ts(5), 9.0)) // later ts wins for user 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(store).orderBy("user_id").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[String]("event_type") == "upgrade")
    assert(rows(1).getAs[String]("event_type") == "view")
  }

  test("T7 e2e: multi-batch node+edge upsert converges to the batch-built store") {
    implicit val sqlCtx = spark.sqlContext
    // the real events fixture AT sf0.1 (r15 verdict #8 — 100k events, so
    // each micro-batch's read-merge-swap works a genuinely growing store),
    // driven through THREE micro-batches feeding BOTH incremental upserts
    // at once, with batch-1 rows re-delivered in the last batch (late
    // duplicates / at-least-once delivery); the resulting stores must
    // equal the ones built from the full static frame in one shot.
    // (user_id, ts) is unique in the fixture at this SF (checked), so the
    // last-wins winner per user is deterministic.
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val all = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
    assert(all.size >= 100000)
    val (b1, rest) = all.splitAt(all.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 3)
    val tmp = Files.createTempDirectory("graft_e2e").toString
    val nodeStore = tmp + "/nodes"
    val edgeStore = tmp + "/edges"
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def df = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val qn = Streams.incrementalUpsert(df, spark, nodeStore, keyCol = "user_id").start()
    val qe = Streams.incrementalEdgeUpsert(df, spark, edgeStore,
      srcCol = "user_id", dstCol = "event_type").start()
    Seq(b1, b2, b3 ++ b1.take(7)).foreach { b =>
      stream.addData(b: _*)
      qn.processAllAvailable()
      qe.processAllAvailable()
    }
    qn.stop(); qe.stop()
    // batch-built node store: A10 last-wins per user over the static frame
    // ((user_id, ts) is unique in the fixture, so the winner is unique)
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc_nulls_last)
    val wantNodes = events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    val gotNodes = spark.read.parquet(nodeStore)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(gotNodes == wantNodes)
    // batch-built edge store: distinct (user, event_type) identities
    val wantEdges = events.select("user_id", "event_type").distinct()
      .as[(Long, String)].collect().toSet
    val gotEdges = spark.read.parquet(edgeStore)
      .as[(Long, String)].collect().toSet
    assert(gotEdges == wantEdges)
  }

  test("T7b incremental edge upsert: stream merge equals batch M2 dedup") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_store").toString + "/edges"
    val stream = MemoryStream[(Long, Long, Timestamp)]
    val q = Streams.incrementalEdgeUpsert(
      stream.toDF().toDF("src", "dst", "ts"),
      spark, store, srcCol = "src", dstCol = "dst").start()
    stream.addData((1L, 2L, ts(0)), (1L, 3L, ts(1)), (1L, 2L, ts(2)))
    q.processAllAvailable()
    // batch 2 re-delivers (1,2) and adds (2,3): the anti join absorbs the
    // duplicate — at-least-once delivery, exactly-once edges
    stream.addData((1L, 2L, ts(5)), (2L, 3L, ts(6)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch equivalent: distinct edge identities over the full event log
    val all = Seq((1L, 2L), (1L, 3L), (1L, 2L), (1L, 2L), (2L, 3L))
    assert(got == all.distinct.toSet)
  }

  test("T7b edge upsert with property identity keeps parallel edges distinct") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_prop").toString + "/edges"
    def batch(rows: (Long, Long, String)*) = rows.toDF("src", "dst", "kind")
    Streams.upsertEdgeBatch(spark, batch((1L, 2L, "a"), (1L, 2L, "b")), store,
      "src", "dst", propCols = Seq("kind"))
    Streams.upsertEdgeBatch(spark, batch((1L, 2L, "a"), (1L, 2L, "c")), store,
      "src", "dst", propCols = Seq("kind"))
    val got = spark.read.parquet(store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 2L, "a"), (1L, 2L, "b"), (1L, 2L, "c")))
  }

  test("T7 upsert swap: crash state self-heals and read errors propagate") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def batch(rows: (Long, String, Timestamp, Double)*) =
      rows.toDF("user_id", "event_type", "ts", "value")

    // simulate a crash between the two swap renames: the store sits at
    // __old and the path itself is missing — the next upsert must restore
    // it and merge, not start from scratch
    val store = Files.createTempDirectory("graft_heal").toString + "/nodes"
    Streams.upsertBatch(spark, batch((1L, "click", ts(0), 1.0)), store, "user_id")
    fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + "__old"))
    Streams.upsertBatch(spark, batch((2L, "view", ts(1), 2.0)), store, "user_id")
    val healed = spark.read.parquet(store).orderBy("user_id").collect()
    assert(healed.length == 2, "pre-crash rows must survive the healed swap")

    // a store path that EXISTS but fails to read must throw — treating it
    // as 'first batch' would silently discard all previously upserted rows
    val broken = Files.createTempDirectory("graft_broken").toString + "/nodes"
    Files.createDirectories(java.nio.file.Paths.get(broken))
    Files.write(java.nio.file.Paths.get(broken, "part-00000.parquet"),
      "not a parquet file".getBytes)
    assertThrows[Exception](
      Streams.upsertBatch(spark, batch((3L, "click", ts(2), 3.0)), broken, "user_id"))
  }
}
