package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic global doc-id assignment — the replacement for the
  * reference's insertion-order slots (`compressed_slot_t`,
  * /root/reference/include/usearch/index.hpp:1872): ids must be a pure
  * function of the DATA, not of task scheduling, so every run and every
  * parallelism level numbers documents identically (north-rule
  * rank-identity precondition).
  *
  * Scalable two-pass pattern (no single-partition Window):
  *   1. repartitionByRange(sortCols) + sortWithinPartitions — a total
  *      global order, each partition holds a contiguous key range;
  *   2. count rows per partition (tiny driver collect: one long per
  *      partition), prefix-sum into per-partition offsets;
  *   3. mapPartitions: id = partitionOffset + local position.
  *
  * At 10^12 rows this is two scans and one ~O(partitions) collect —
  * no global shuffle beyond the range partitioning the sort needs anyway.
  */
object DocIds {

  /** Returns `df` plus a `doc_id` column: dense 0-based ids in the total
    * order of `sortCols` (which must be a unique key — for the corpus:
    * repo, path, commit).
    */
  def assign(spark: SparkSession, df: DataFrame, sortCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val cols = sortCols.map(col)
    // persisted between the two passes: the count pass and the id pass
    // MUST see identical partition boundaries, and re-running
    // repartitionByRange would re-sample the input — deterministic in
    // practice, but correctness should not hinge on sampler stability.
    // (Unpersist is left to Spark's ContextCleaner once the returned
    // plan is unreferenced; callers consume the result immediately.)
    val sorted = df
      .repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: rows per partition, in partition order
    val counts = sorted
      .select(spark_partition_id().as("pid"))
      .groupBy(col("pid")).count()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val offsetsB = spark.sparkContext.broadcast(offsets)

    // pass 2: offset + local position (deterministic because the
    // partition contents and their sort order are data-defined)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, false))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = offsetsB.value(pid)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        i += 1
        out
      }
    }(enc)
  }
}
