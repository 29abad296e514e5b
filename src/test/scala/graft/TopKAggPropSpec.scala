package graft

import org.scalacheck.Gen

/** Randomized property coverage for the bounded top-k aggregate: at any
  * partitioning (partial-merge order), the result equals the global
  * sorted-take oracle, duplicates included. (Plain scalacheck generators
  * sampled in a loop — scalatestplus is not in the offline cache; same
  * pattern as CodecSpec.)
  */
class TopKAggPropSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Double, Long)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, 4)
      s <- Gen.choose(-100, 100).map(_ / 7.0)
      id <- Gen.choose(0L, 50L)
    } yield (g, s, id))
  } yield rows

  test("NaN scores are skipped outright, never poisoning the buffer") {
    // the comparator is not a total order over NaN (compare(a,b) =
    // compare(b,a) = 1), and window oracles disagree cross-engine on
    // where NaN sorts — the declared policy drops NaN rows like nulls
    val rows = Seq(
      (1, 0.5, 10L), (1, Double.NaN, 11L), (1, 0.2, 12L),
      (1, Double.NaN, 13L), (1, 0.9, 14L))
    val got = spark.createDataset(rows).toDF("g", "s", "id")
      .groupBy($"g")
      .agg(graft.functions.TopKAgg.least($"s", $"id", 2).as("t"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1))).toList
    assert(got == List((0.2, 12L), (0.5, 10L)))
    val gotMax = spark.createDataset(rows).toDF("g", "s", "id")
      .groupBy($"g")
      .agg(graft.functions.TopKAgg.greatest($"s", $"id", 10).as("t"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1))).toList
    assert(gotMax == List((0.9, 14L), (0.5, 10L), (0.2, 12L)))
  }

  test("TopKAgg == sorted-take oracle on random data, any partitioning") {
    var seed = org.scalacheck.rng.Seed(12345L)
    (1 to 20).foreach { _ =>
      val rows = rowsGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val k = 1 + math.abs(seed.long._1 % 7).toInt
      val oracle: Map[Int, List[(Double, Long)]] = rows.groupBy(_._1).map {
        case (g, rs) => g -> rs.map(r => (r._2, r._3)).sorted.take(k)
      }
      for (parts <- Seq(1, 7)) {
        val df = spark.createDataset(rows).toDF("g", "s", "id").repartition(parts)
        val got = df.groupBy($"g")
          .agg(graft.functions.TopKAgg.least($"s", $"id", k).as("t"))
          .collect().map { r =>
            r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
              .map(x => (x.getDouble(0), x.getLong(1))).toList
          }.toMap
        assert(got.keySet == oracle.keySet)
        oracle.foreach { case (g, exp) =>
          assert(got(g) == exp, s"group $g parts=$parts k=$k")
        }
      }
    }
  }
}
