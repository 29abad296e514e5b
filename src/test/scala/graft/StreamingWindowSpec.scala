package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingWindow

/** Watermarked windowed aggregation: micro-batched execution emits the
  * same finalized windows as the identical batch plan over the on-time
  * rows, and a post-watermark late arrival is dropped (bounded state).
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int, sec: Int = 0) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  test("eventStats stream == batch on on-time rows; late row dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamingWindow
      .eventStats(stream, windowDur = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()

    val onTime = Seq(
      (t(1), "click", 1.25), (t(4), "click", 2.50), (t(7), "buy", 10.00),
      (t(12), "click", 0.75), (t(16), "buy", 5.00))
    // batch 1: the 10:00 and 10:10 windows fill
    input.addData(onTime.take(3): _*)
    q.processAllAvailable()
    // batch 2: more 10:10-window rows; watermark = 16−5 = 10:11 finalizes
    // the 10:00 window
    input.addData(onTime.drop(3): _*)
    q.processAllAvailable()
    // batch 3: a LATE row for the already-finalized 10:00 window (event
    // time far behind the 10:11 watermark) must be dropped, and an
    // advancing row finalizes the 10:10 window
    input.addData((t(2), "click", 99.99), (t(40), "flush", 0.0))
    q.processAllAvailable()
    // batch 4: advance watermark past 10:45 so the flush window finalizes
    input.addData((t(59), "flush2", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .select($"win_start", $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = StreamingWindow
      .eventStats((onTime :+ ((t(40), "flush", 0.0))).toDF("ts", "event_type", "value"))
      .as[(String, String, Long, Double)].collect().toSet
    // every finalized window matches the batch plan exactly — and the
    // late 99.99 click never appears anywhere
    assert(streamed.subsetOf(batch + (("2026-01-01 10:50:00", "flush2", 1L, 0.0))),
      s"streamed windows not a subset of batch: ${streamed.diff(batch)}")
    assert(streamed.exists(_._1 == "2026-01-01 10:00:00"), "10:00 window must finalize")
    val w1000 = streamed.filter(r => r._1 == "2026-01-01 10:00:00" && r._2 == "click")
    assert(w1000 == Set(("2026-01-01 10:00:00", "click", 2L, 3.75)),
      s"late row must be dropped from the finalized 10:00 window: $w1000")
  }

  test("trendingTerms: windowed term counts match the batch tf of each window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")

    val q = StreamingWindow
      .trendingTerms(stream, windowDur = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("terms_out").start()

    input.addData(
      (t(1), "spark merge spark"), (t(3), "merge table"), (t(12), "spark"))
    q.processAllAvailable()
    input.addData((t(30), "flush"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("terms_out")
      .where($"win_start" === "2026-01-01 10:00:00")
      .select($"term", $"n").as[(String, Long)].collect().toMap
    assert(got == Map("spark" -> 2L, "merge" -> 2L, "table" -> 1L),
      s"10:00-window term counts wrong: $got")
  }
}
