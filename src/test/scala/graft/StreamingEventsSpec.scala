package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming windowed aggregation over the events table:
  * the stream plan (watermark + tumbling window) must produce exactly the
  * batch groupBy over the same data once all input is processed.
  */
class StreamingEventsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed windowed counts equal the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val schema = batchDf.schema

    // file stream sources need a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
      // parquet carries TIMESTAMP_NTZ; event-time watermarks need TIMESTAMP
      .withColumn("ts", $"ts".cast("timestamp"))

    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ev_counts")
      .select($"window.start".cast("long").as("w"), $"event_type", $"n", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    val batch = batchDf
      .withColumn("ts", $"ts".cast("timestamp"))
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select($"window.start".cast("long").as("w"), $"event_type", $"n", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
