package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{Dedup, Similarity}

/** The bucketed near-dup paths (hyperplane-LSH embeddings, banded
  * simhash) against their exact quadratic oracles, plus plan shape: the
  * scale paths must never plan an all-pairs (cartesian / nested-loop)
  * join — candidates come only from band-bucket equijoins.
  */
class SimilaritySpec extends SparkSpec {

  private def assertNoAllPairsJoin(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$what plans a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$what plans a BroadcastNestedLoopJoin:\n$plan")
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"embedding near-dup: LSH == exact quadratic oracle ($dir)") {
      val exact = Similarity.embNearDupExact(spark, dir).collect().toSeq
      val lsh = Similarity.embNearDup(spark, dir).collect().toSeq
      assert(lsh.nonEmpty, "near-dup fixture produced no pairs — vacuous")
      assert(lsh == exact, s"LSH missed/added pairs: got ${lsh.size}, want ${exact.size}")
    }
  }

  test("embedding near-dup plan is band-bucketed (no all-pairs join)") {
    assertNoAllPairsJoin(
      Similarity.embNearDup(spark, "/root/testdata/sf0.001"), "embNearDup")
  }

  test("simhash near-dup: banded == all-pairs (pigeonhole exactness)") {
    val dir = "/root/testdata/sf0.001"
    val banded = Dedup.simhashHamming(spark, dir).collect().toSeq
    // reference all-pairs formulation, inline (the shape the banded join
    // replaced): every pair, filter by bit_count(xor)
    import org.apache.spark.sql.functions._
    val sh = Dedup.simhash(spark, dir)
    val a = sh.select(col("doc_id").as("left_id"), col("simhash").as("ha"))
    val b = sh.select(col("doc_id").as("right_id"), col("simhash").as("hb"))
    val allPairs = a.join(b, col("left_id") < col("right_id"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("hamming") <= 3)
      .select(col("left_id"), col("right_id"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("left_id"), col("right_id"))
      .collect().toSeq
    assert(banded == allPairs)
  }

  test("simhash near-dup plan is band-bucketed (no all-pairs join)") {
    assertNoAllPairsJoin(
      Dedup.simhashHamming(spark, "/root/testdata/sf0.001"), "simhashHamming")
  }
}
