package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Streaming exact dedup: duplicates within the watermark horizon are
  * dropped across micro-batches; distinct contents all survive.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch duplicates within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "content")

    val deduped = StreamingDedup.dedupe(stream, watermark = "10 minutes")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()

    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // batch 1: two distinct docs + an in-batch duplicate
    input.addData((t(0), "alpha"), (t(1), "beta"), (t(2), "alpha"))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate (within watermark) + a new doc
    input.addData((t(3), "alpha"), (t(4), "gamma"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").select($"content").as[String].collect().sorted
    assert(got.toSeq == Seq("alpha", "beta", "gamma"),
      s"expected one survivor per distinct content, got ${got.toSeq}")
  }
}
