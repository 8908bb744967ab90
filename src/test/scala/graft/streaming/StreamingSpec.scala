package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  test("windowedCounts over the real events table matches a direct groupBy") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = EventStreams.windowedCounts(ev, "1 hour")
    val want = ev.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    assert(got.count() === want.count())
    assert(got.join(want, Seq("window_start", "event_type"))
      .filter(got("n") =!= want("n")).count() === 0L)
  }

  test("streaming windowed counts equal the batch result (memory sink)") {
    val dir = "/root/testdata/sf0.001"
    // two arrivals: append-mode windows only emit once the watermark
    // advances, and the watermark only moves BETWEEN micro-batches — a
    // single batch of files emits nothing by design
    val srcDir = java.nio.file.Files.createTempDirectory("evstream").toString
    val ev = spark.read.parquet(s"$dir/events.parquet").cache()
    // split by TIME, not id: late rows below the watermark would be
    // dropped and the emitted counts would undercount vs batch
    val mid = ev.agg(percentile_approx(col("ts"), lit(0.5), lit(1000))).head.getAs[java.time.LocalDateTime](0)
    ev.filter(col("ts") <= lit(mid)).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = EventStreams.windowedCountsStream(stream.toDF(), "1 hour", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("winout")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    q.processAllAvailable()
    ev.filter(col("ts") > lit(mid)).write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    val got = spark.table("winout")
    val batch = EventStreams.windowedCounts(ev, "1 hour")
    // every emitted window matches the batch result exactly, and the
    // watermark advance from arrival 1 must have closed some windows
    assert(got.count() > 0)
    assert(got.join(batch, Seq("window_start", "event_type"))
      .filter(got("n") =!= batch("n")).count() === 0L)
    assert(got.join(batch, Seq("window_start", "event_type"), "left_anti").count() === 0L)
    q.stop()
  }

  test("sessionize groups events within the gap") {
    val spark2 = spark
    import spark2.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val evs = Seq(
      EventStreams.Event(1, ts(0), 7L, "view", 1.0),
      EventStreams.Event(2, ts(1000), 7L, "click", 1.0),
      EventStreams.Event(3, ts(100000), 7L, "view", 1.0), // new session
      EventStreams.Event(4, ts(500), 8L, "view", 1.0)).toDS()
    val sessions = EventStreams.sessionize(evs, gapMs = 10000).collect()
    // batch mode emits closed sessions; user 7's first session closes when
    // the 100s event arrives
    assert(sessions.contains(EventStreams.Session(7L, 2, 0L, 1000L)))
  }

  test("sessionizeBatch emits every session, a superset of the streaming path's closed ones") {
    val spark2 = spark
    import spark2.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val evs = Seq(
      EventStreams.Event(1, ts(0), 7L, "view", 1.0),
      EventStreams.Event(2, ts(1000), 7L, "click", 1.0),
      EventStreams.Event(3, ts(100000000), 7L, "view", 1.0), // >1800s later
      EventStreams.Event(4, ts(500), 8L, "view", 1.0)).toDS()
    val batch = EventStreams.sessionizeBatch(evs.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // sessionizeBatch (default gap 1800s, epoch-second granularity) closes
    // user 7's first session AND emits the trailing open ones the streaming
    // operator can never flush under batch execution
    assert(batch === Set(
      (7L, 2L, 0L, 1L),       // closed: events at 0ms and 1000ms
      (7L, 1L, 100000L, 100000L), // the trailing session streaming would hold open
      (8L, 1L, 0L, 0L)))
    // streaming path's closed sessions correspond to a subset
    val closed = EventStreams.sessionize(evs, gapMs = 1800000).collect()
    assert(closed.map(s => (s.user_id, s.n_events.toLong)).toSet.subsetOf(
      batch.map(b => (b._1, b._2))))
  }
}
