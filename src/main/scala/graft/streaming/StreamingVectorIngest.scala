package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming vector ingestion into a persisted IVF index —
  * the vector-side incremental `add` (thread-safe adds,
  * /root/reference/include/usearch/index.hpp:2780-2880; add-then-search
  * lifecycle index_dense.hpp:779-817): each micro-batch of (id, vec)
  * rows is assigned to the EXISTING centroids with one broadcast argmin
  * (l2sq asc, cid asc — the builder's k-means tie rule, the same rule as
  * the batch `Similarity.ivfAddAssignments`) and APPENDED to the
  * cell-partitioned assignments store. No recluster, no rewrite of
  * resident cells: a micro-batch costs O(batch · nlist) distances and
  * touches only the partitions its vectors land in. Searches probing a
  * cell see streamed vectors as soon as their batch commits.
  */
object StreamingVectorIngest {

  /** Start ingesting `stream` (columns id: Long, vec: array<double>)
    * against fixed `centroids` (cid, cvec), appending (id, cid, vec)
    * partitioned by cell under `outDir`.
    */
  def start(spark: SparkSession, stream: DataFrame, centroids: DataFrame,
      outDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(outDir))
    val cents = broadcast(centroids.select(col("cid"), col("cvec")))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dotCol(a, b)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          batch.select(col("id"), col("vec"))
            .crossJoin(cents)
            .select(col("id"), col("vec"),
              struct(
                (dot(col("vec"), col("vec")) - lit(2.0) * dot(col("vec"), col("cvec"))
                  + dot(col("cvec"), col("cvec"))).as("dist"),
                col("cid").as("cid")).as("dc"))
            .groupBy(col("id"))
            // vec is constant within the group — first() is deterministic here
            .agg(min(col("dc")).as("m"), first(col("vec")).as("vec"))
            .select(col("id"), col("m.cid").as("cid"), col("vec"))
            .write.mode("append").partitionBy("cid").parquet(outDir)
        }
        ()
      }
      .start()
  }
}
