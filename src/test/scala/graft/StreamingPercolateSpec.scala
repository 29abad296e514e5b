package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Fulltext
import graft.streaming.StreamingPercolate

/** Streamed percolation must route exactly the docs the batch operator
  * routes, regardless of micro-batch boundaries, with no aggregation
  * state (append mode, no watermark).
  */
class StreamingPercolateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed percolate == batch percolate across micro-batch boundaries") {
    val arrivals = spark.read.parquet(s"$dir/documents.parquet")
      .where($"doc_id" % 17 === 0)
      .select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(arrivals.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingPercolate.attach(
      mem.toDF().toDF("doc_id", "text"), Fulltext.PercolateQueries)
    val query = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("perc_out")
      .start()
    mem.addData(arrivals.take(7))
    query.processAllAvailable()
    mem.addData(arrivals.slice(7, 19))
    query.processAllAvailable()
    mem.addData(arrivals.drop(19))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("perc_out")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    val batch = Fulltext.percolate(spark,
      spark.read.parquet(s"$dir/documents.parquet").where($"doc_id" % 17 === 0),
      Fulltext.PercolateQueries)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(streamed == batch)
    assert(streamed.nonEmpty, "vacuous streaming percolate fixture")

    // the static transform is the same operator: batch entry parity
    val static = StreamingPercolate.attach(
      spark.read.parquet(s"$dir/documents.parquet").where($"doc_id" % 17 === 0)
        .select($"doc_id", $"text"),
      Fulltext.PercolateQueries)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(static == batch)
  }
}
