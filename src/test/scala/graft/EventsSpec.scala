package graft

import graft.ops.Relational

/** Sessionization and as-of enrichment vs driver-side brute force —
  * the per-user window ops must equal a literal per-user scan.
  */
class EventsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (event_id, user_id, event_type, us) sorted the engine's way
  private lazy val events: Seq[(Long, Long, String, Long)] =
    spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("sessionize == per-user brute-force gap chaining") {
    val gapUs = 240L * 60000000L
    val expected = events.groupBy(_._2).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      // chain into sessions, emit (user, session_id=min event, n, duration)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, String, Long)]]
      sorted.foreach { e =>
        if (sessions.nonEmpty && e._4 - sessions.last.last._4 <= gapUs)
          sessions(sessions.size - 1) = sessions.last :+ e
        else sessions += Seq(e)
      }
      sessions.map { s =>
        (uid, s.map(_._1).min, s.size.toLong, s.map(_._4).max - s.map(_._4).min)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Relational.qSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 1) && got.exists(_._3 == 1L),
      "fixture lacks multi-event AND singleton sessions — a branch is untested")
  }

  test("as-of == per-user brute-force latest-prior-signup scan") {
    val expected = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      var lastSignup = -1L
      sorted.flatMap { e =>
        if (e._3 == "signup") lastSignup = e._4
        if (e._3 == "purchase") Some((e._1, e._2, e._4, lastSignup)) else None
      }
    }.sortBy(_._1)
    val got = Relational.qEventsAsof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._4 == -1L) && got.exists(_._4 >= 0L),
      "fixture lacks matched AND unmatched purchases — a branch is untested")
  }
}
