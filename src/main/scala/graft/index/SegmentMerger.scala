package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.PostingCodec

/** LSM compaction of index generations — the analog of the reference's
  * `compact` + `isolate` maintenance pair
  * (/root/reference/include/usearch/index.hpp:3595-3682, :3700-3728):
  * k generations are folded into one snapshot, tombstoned documents are
  * physically dropped (postings AND norms), and every posting block is
  * re-encoded so its block-max summary reflects the merged corpus stats.
  *
  * Implementation: decode source segments back to (doc_id, term, tf)
  * rows (a distributed flatMap — no driver materialization), anti-join
  * the tombstones, and rebuild through IndexBuilder.buildFromTf. That
  * reuses the one tested build path, so a merged index is
  * byte-equivalent in behavior to a fresh build over the surviving docs.
  */
object SegmentMerger {

  /** Decode one generation's segments to tf rows. */
  def decodedTf(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(IndexBuilder.Layout(root).segments).as[PostingRow]
      .flatMap { row =>
        val p = PostingCodec.decodeBlocks(row.blocks.map(_.bytes).toSeq)
        Iterator.tabulate(p.size)(i => (p.docIds(i), row.term, p.tfs(i).toLong))
      }
      .toDF("doc_id", "term", "tf")
  }

  /** Merge generations into `outRoot`. `tombstones`: doc_ids to drop
    * (the remove/isolate path). Returns the merged stats.
    */
  def merge(
      spark: SparkSession,
      roots: Seq[String],
      outRoot: String,
      tombstones: Option[DataFrame] = None,
      targetBuckets: Int = 0): IndexStats = {
    import spark.implicits._
    require(roots.nonEmpty)

    val tf0 = roots.map(decodedTf(spark, _)).reduce(_ union _)
    val tf = tombstones match {
      case Some(ts) => tf0.join(ts.select(col("doc_id")), Seq("doc_id"), "left_anti")
      case None => tf0
    }

    // surviving corpus cardinality from the merged norms, not from tf
    // (a doc could in principle have zero postings)
    val docsAll = roots
      .map(r => spark.read.parquet(IndexBuilder.Layout(r).doclens).as[DocLenRow]
        .flatMap(_.docIds).toDF("doc_id"))
      .reduce(_ union _)
    val docs = tombstones match {
      case Some(ts) => docsAll.join(ts.select(col("doc_id")), Seq("doc_id"), "left_anti")
      case None => docsAll
    }
    val nDocs = docs.distinct().count()

    IndexBuilder.buildFromTf(spark, tf, nDocs, outRoot, targetBuckets)
  }
}
