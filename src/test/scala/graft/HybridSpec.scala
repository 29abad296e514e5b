package graft

import org.apache.spark.sql.functions._

import graft.ops.{Fulltext, Hybrid, Similarity}

/** Hybrid RRF fusion: the fused list must equal a hand-computed RRF of
  * the two sources' independent rankings, the batched form must equal
  * per-query runs, and a lexically-dead query must degenerate to the
  * pure vector ranking.
  */
class HybridSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getLong(5))).toSeq

  test("fused list == hand-computed RRF of the two source rankings") {
    val s = Fulltext.indexFor(spark, dir)
    val depth = Hybrid.Depth
    val lexRanks = s.search(Fulltext.RefQuery.mkString(" "), depth).collect()
      .map(r => r.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val vecRanks = Similarity.knnExact(spark, dir, k = depth, queryVecId = 0L)
      .collect().map(r => r.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    def ppm(r: Option[Int]): Long =
      r.map(x => 1000000L / (Hybrid.RrfDamp + x)).getOrElse(0L)
    val expected = (lexRanks.keySet ++ vecRanks.keySet).toSeq
      .map { id =>
        val p = ppm(lexRanks.get(id)) + ppm(vecRanks.get(id))
        (id, lexRanks.getOrElse(id, 0), vecRanks.getOrElse(id, 0), p)
      }
      .sortBy { case (id, _, _, p) => (-p, id) }
      .take(Fulltext.K)
      .zipWithIndex
      .map { case ((id, lr, vr, p), i) => (i + 1, id, lr, vr, p) }
    val got = Hybrid.engHybridRrf(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSeq
    assert(got == expected)
    // non-vacuous: the fused head draws on BOTH sources somewhere in top-k
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
  }

  test("batched hybrid == per-query hybrid") {
    val batched = rows(Hybrid.rrfMany(spark, dir))
    val single = Hybrid.HybridQueries.flatMap { q =>
      rows(Hybrid.rrfMany(spark, dir, Seq(q)))
    }
    assert(batched == single)
  }

  test("IVF-backed hybrid at exhaustive probe == exact hybrid, bit-for-bit") {
    assert(rows(Hybrid.rrfManyIvf(spark, dir, nlist = 8, nprobe = 8)) ==
      rows(Hybrid.rrfMany(spark, dir)))
    // a partial probe still returns a full fused page per live query
    val partial = rows(Hybrid.rrfManyIvf(spark, dir, nlist = 8, nprobe = 2))
    assert(Hybrid.HybridQueries.map(_._1).forall(q =>
      partial.count(_._1 == q) == Fulltext.K))
  }

  test("lexically-dead term drops out; fusion still ranks by both sources") {
    // query 2's 'zzznope' is dictionary-absent: its lexical list is the
    // list for 'vector' alone
    val fused = rows(Hybrid.rrfMany(spark, dir)).filter(_._1 == 2)
    val lexOnly = Fulltext.indexFor(spark, dir).search("vector", Hybrid.Depth)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    assert(fused.nonEmpty)
    fused.foreach { case (_, _, id, lr, _, _) =>
      assert(lr == lexOnly.getOrElse(id, 0),
        s"doc $id lexical rank $lr != recomputed ${lexOnly.getOrElse(id, 0)}")
    }
  }
}
