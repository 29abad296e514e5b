package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.StreamingVectorIngest

/** Streamed vector adds against a persisted IVF must land exactly where
  * the batch incremental-add path puts them (same centroids, same
  * argmin tie rule), regardless of micro-batch boundaries, and the
  * store must be cell-partitioned on disk.
  */
class StreamingIvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed adds == batch incremental add, cell-partitioned on disk") {
    val split = 400L
    val ivf = Similarity.ivfIndexFor(spark, dir, nlist = 8, maxId = Some(split))
    val outDir = Files.createTempDirectory("graft-sivf-").toString

    val added = spark.read.parquet(s"$dir/embeddings.parquet")
      .where($"vec_id" >= split)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    val query = StreamingVectorIngest.start(spark,
      mem.toDF().toDF("id", "vec"), ivf.centroids, outDir)
    mem.addData(added.take(30))
    query.processAllAvailable()
    mem.addData(added.slice(30, 70))
    query.processAllAvailable()
    mem.addData(added.drop(70))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.read.parquet(outDir)
      .select($"id", $"cid").as[(Long, Long)].collect().toMap
    val batch = Similarity.ivfAddAssignments(spark, dir, nlist = 8, splitId = split)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.size == added.size)

    // physical layout: one directory per landed cell
    val cellDirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).map(_.getName).toSet
    assert(cellDirs == batch.values.toSet.map((c: Long) => s"cid=$c"))

    // a probe of one cell reads only that cell's vectors
    val someCell = batch.values.head
    val probed = spark.read.parquet(outDir).where($"cid" === someCell)
      .select($"id").as[Long].collect().toSet
    assert(probed == batch.filter(_._2 == someCell).keySet)
  }
}
