package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.build.DocIds
import graft.index.IndexBuilder

/** Structured-Streaming ingestion — the analog of the reference's
  * thread-safe incremental `add`
  * (/root/reference/include/usearch/index.hpp:2780-2880), reshaped to
  * Spark's model: each micro-batch becomes one L0 generation index
  * (segments + manifest), doc-id ranges are disjoint and monotonically
  * increasing across batches, and queries run through MultiSearcher
  * (scatter-gather with global stats) until SegmentMerger compacts the
  * generations — a log-structured merge lifecycle.
  */
object StreamingIngest {

  private def counterFile(rootDir: String) = Paths.get(rootDir, "_next_doc_id")

  def nextDocId(rootDir: String): Long =
    if (Files.exists(counterFile(rootDir)))
      Files.readString(counterFile(rootDir)).trim.toLong
    else 0L

  /** All committed generation roots, in batch order. */
  def generations(rootDir: String): Seq[String] = {
    val d = Paths.get(rootDir)
    if (!Files.exists(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("gen-"))
        .map(_.toString)
        .toSeq
        .sortBy(p => p.split("gen-").last.toLong)
    }
  }

  /** Start ingesting `stream` (columns repo, path, commit, lang, content)
    * into L0 generations under `rootDir`. One generation per micro-batch;
    * ids assigned deterministically within the batch by (repo, path,
    * commit) order, offset by the running counter.
    */
  def start(spark: SparkSession, stream: DataFrame, rootDir: String,
      textCol: String = "content"): StreamingQuery = {
    Files.createDirectories(Paths.get(rootDir))
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val offset = nextDocId(rootDir)
          val withIds = DocIds
            .assign(spark, batch, Seq("repo", "path", "commit"))
            .withColumn("doc_id", col("doc_id") + lit(offset))
          val genRoot = s"$rootDir/gen-$batchId"
          val stats = IndexBuilder.build(spark, withIds, genRoot, textCol = textCol)
          Files.writeString(counterFile(rootDir), (offset + stats.nDocs).toString)
        }
        ()
      }
      .start()
  }
}
