package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingCuration

/** The ingest-time blocklist gate is stateless, so micro-batch
  * boundaries must not change results: streamed output over any batch
  * split == the batch operator over the same rows.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("streamed blocklist gate == batch blocklist filter on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(docs.size == 500)

    val input = MemoryStream[(Long, String)]
    val q = StreamingCuration.gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_out").start()
    // three uneven micro-batches — boundaries must be invisible
    input.addData(docs.take(100))
    q.processAllAvailable()
    input.addData(docs.slice(100, 101))
    q.processAllAvailable()
    input.addData(docs.drop(101))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("curation_out")
      .select("doc_id", "n_tokens", "n_blocked", "blocked_bp", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    val batch = graft.ops.TextAnalysis.blocklist(spark, "/root/testdata/sf0.001")
      .where(col("keep") === 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == batch)
    assert(got.size < docs.size, "gate dropped nothing — filter untested")
  }
}
