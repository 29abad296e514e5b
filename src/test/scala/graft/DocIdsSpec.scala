package graft

import graft.build.DocIds

/** Doc-id assignment must be a pure function of the data: the same rows
  * get the same ids at every partition count and parallelism level
  * (north-rule rank-identity precondition; the id is the engine's join
  * key everywhere downstream).
  */
class DocIdsSpec extends SparkSpec {
  import org.apache.spark.sql.functions.{concat, lit}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def idsAt(parts: Int): Map[String, Long] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"text", $"doc_id".as("orig_id"))
    DocIds.assign(spark, docs, Seq("text", "orig_id"), numPartitions = parts)
      .select(concat($"orig_id".cast("string"), lit("|"), $"text").as("key"), $"doc_id")
      .as[(String, Long)].collect().toMap
  }

  test("ids are dense, 0-based, and follow the sort order") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"text", $"doc_id".as("orig_id"))
    val n = docs.count()
    val assigned = DocIds.assign(spark, docs, Seq("text", "orig_id"), numPartitions = 4)
    val rows = assigned.select($"doc_id", $"text", $"orig_id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until n).toSeq, "ids not dense 0-based")
    val sortedKeys = rows.map(r => (r._2, r._3)).toSeq
    assert(sortedKeys == sortedKeys.sorted, "ids do not follow (text, orig_id) order")
  }

  test("ids are invariant across partition counts") {
    val a = idsAt(3)
    val b = idsAt(7)
    val c = idsAt(32)
    assert(a == b, "ids differ between 3 and 7 partitions")
    assert(a == c, "ids differ between 3 and 32 partitions")
  }
}
