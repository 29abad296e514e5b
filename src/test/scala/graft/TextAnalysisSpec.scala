package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Dedup, TextAnalysis}

/** Pipeline-operator invariants added in round 5:
  *   - token-budget packing: the scale-safe two-level form (bounded
  *     (lang, quality_bp) run table + per-run windows) must equal the
  *     naive stratum-wide window, and its physical plan must contain NO
  *     stratum-wide per-doc window;
  *   - byte-variant string distances vs an independent JVM reference;
  *   - the Dedup memo caches are LRU-bounded (evicted dirs unpersist).
  */
class TextAnalysisSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The pre-round-5 formulation: ONE window per stratum — correct but a
    * single task per stratum at scale; kept here as the test oracle.
    */
  private def tokenBudgetWindowed(budget: Long) = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(desc("quality_bp"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextAnalysis.quality(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("lang"), col("quality_bp"), col("cum_tokens"))
  }

  test("token budget: two-level run form equals the stratum-wide window at any budget") {
    for (budget <- Seq(500L, 3000L, 20000L)) {
      val got = TextAnalysis.tokenBudget(spark, dir, budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = tokenBudgetWindowed(budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want, s"budget=$budget: two-level diverged from windowed")
      assert(got.nonEmpty, s"budget=$budget kept nothing — vacuous fixture")
    }
  }

  test("token budget: no per-doc window is partitioned by the stratum alone") {
    // the old scale-killer's signature: a window ordered
    // (quality_bp DESC, doc_id ASC) — i.e. per-DOC rows partitioned only
    // by lang. The two-level plan orders its lang-partitioned window by
    // quality_bp alone (over ≤ 10001 aggregated run rows) and its
    // per-doc window by doc_id within (lang, quality_bp).
    val plan = TextAnalysis.tokenBudget(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*quality_bp#\\d+L? DESC NULLS LAST, doc_id#.*"),
      s"found a stratum-wide per-doc window in:\n$plan")
    assert(plan.contains("windowspecdefinition(lang"), "expected window operators in the plan")
  }

  // independent byte-level references (UTF-8 code units)
  private def refLev(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  test("byte-variant distances: native expressions match the JVM byte reference") {
    import spark.implicits._
    val pairs = Seq(
      ("ä", "b"), ("käse", "kase"), ("", "abc"), ("same", "same"),
      ("aä", "äa"), ("αβγ", "αβδ"), ("mixedä1", "mixedö1"))
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      graft.functions.ByteDistances.levenshteinBytes(col("a"), col("b")).as("lev"),
      levenshtein(col("a"), col("b")).as("lev_chars"))
    df.collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getInt(2) == refLev(a, b), s"lev_bytes('$a','$b')")
    }
    // the byte and unicode forms genuinely diverge on multibyte input
    val div = df.where(col("a") === "ä").head()
    assert(div.getInt(2) == 2 && div.getInt(3) == 1,
      "byte vs unicode levenshtein did not diverge on 'ä' vs 'b'")

    val ham = Seq(("aä", "äa"), ("αα", "αβ"), ("same", "samt"))
      .toDF("a", "b")
      .select(graft.functions.ByteDistances.hammingBytes(col("a"), col("b")).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(ham == Seq(3, 1, 1), s"hamming_bytes: $ham")
  }

  test("dedup memo caches are LRU-bounded: a second dir evicts the first at cap 1") {
    val cap0 = Dedup.memoCacheCap
    Dedup.memoCacheCap = 1
    try {
      val first = Dedup.minhashTable(spark, "/root/testdata/sf0.001")
      assert(Dedup.memoSizes._2 == 1)
      val second = Dedup.minhashTable(spark, "/root/testdata/sf0.01")
      assert(Dedup.memoSizes._2 == 1, "cap 1 held two dirs")
      assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "evicted frame was not unpersisted")
      assert(second.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      // re-requesting the evicted dir just re-memoizes (correctness
      // unchanged — the dd_* driver entries stay green regardless of cap)
      Dedup.minhashTable(spark, "/root/testdata/sf0.001")
      assert(Dedup.memoSizes._2 == 1)
    } finally Dedup.memoCacheCap = cap0
  }

  // shared driver-side recompute: doc_id -> tokens at sf0.001
  private lazy val tokenized: Seq[(Long, Array[String])] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), graft.analyze.Tokenizer.tokenize(r.getString(1))))
      .sortBy(_._1).toSeq

  test("blocklist == brute-force token-membership recomputation") {
    val bl = TextAnalysis.Blocklist.toSet
    val expected = tokenized.map { case (id, toks) =>
      val n = toks.length.toLong
      val nb = toks.count(bl).toLong
      val bp = (20000L * nb + n) / (2L * n)
      (id, n, nb, bp, if (bp < 500L) 1L else 0L)
    }
    val got = TextAnalysis.blocklist(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._5 == 0L) && got.exists(_._5 == 1L),
      "threshold doesn't split the fixture — keep branch untested")
    assert(tokenized.forall(!_._2.contains("xyzzyblocked")),
      "canary term leaked into the corpus")
  }

  test("boilerplate == brute-force cross-doc 5-gram recomputation") {
    val grams = tokenized.collect { case (id, toks) if toks.length >= 5 =>
      (id, toks.sliding(5).map(_.mkString(" ")).toSeq)
    }
    val docFreq = grams.flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, xs) => (g, xs.size.toLong) }
    val expected = grams.map { case (id, gs) =>
      val n = gs.length.toLong
      val nb = gs.count(g => docFreq(g) >= 3L).toLong
      (id, n, nb, (20000L * nb + n) / (2L * n))
    }
    val got = TextAnalysis.boilerplate(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0),
      "fixture lacks boiler/clean mix — one branch untested")
  }

  test("decontaminate == brute-force split-overlap recomputation") {
    val grams = tokenized.collect { case (id, toks) if toks.length >= 5 =>
      (id, toks.sliding(5).map(_.mkString(" ")).toSeq)
    }
    val train = grams.collect { case (id, gs) if id % 20 != 0 => gs }.flatten.toSet
    val expected = grams.collect { case (id, gs) if id % 20 == 0 =>
      val hits = gs.count(train).toLong
      (id, gs.length.toLong, hits, if (hits > 0) 1L else 0L)
    }
    val got = TextAnalysis.decontaminate(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == 0L),
      "fixture lacks contaminated/clean mix — one branch untested")
  }

  test("rarity == brute-force document-frequency recomputation") {
    val nDocs = tokenized.size.toLong
    val df = tokenized.flatMap { case (id, toks) => toks.distinct.map(t => (t, id)) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.size.toLong) }
    val expected = tokenized.collect { case (id, toks) if toks.nonEmpty =>
      val n = toks.length.toLong
      val s = toks.map(df).sum
      (id, n, s, (20000L * s + n * nDocs) / (2L * n * nDocs))
    }
    val got = TextAnalysis.rarity(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("pack sequences == brute-force per-shard greedy concatenation") {
    val expected = tokenized
      .map { case (id, toks) => (id, id / TextAnalysis.PackShardSpan, toks.length.toLong) }
      .groupBy(_._2).toSeq.flatMap { case (_, shard) =>
        var cum = 0L
        shard.sortBy(_._1).map { case (id, sh, n) =>
          val prev = cum; cum += n
          (id, sh, n, prev / 512L, prev % 512L)
        }
      }.sortBy(_._1)
    val got = TextAnalysis.packSequences(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.exists(_._4 > 0), "no shard spills into a second sequence — packing untested")
    assert(got.map(_._2).distinct.size > 1, "single shard — shard isolation untested")
  }

  test("quality median == brute-force percentile_disc over collected scores") {
    val dir = "/root/testdata/sf0.001"
    val q = TextAnalysis.quality(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang"), "doc_id")
      .select("lang", "quality_bp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = q.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.size
      val median = sorted((n + 1) / 2 - 1) // smallest value with cum >= ceil(n/2)
      (lang, n.toLong, median, xs.count(_._2 >= median).toLong)
    }.sortBy(_._1)
    val got = TextAnalysis.qualityMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.size > 1, "single stratum — per-lang grouping untested")
    got.foreach { case (lang, n, _, kept) =>
      assert(kept * 2 >= n, s"$lang: median keeps under half")
    }
  }

  test("repetition == brute-force sliding-bigram recomputation") {
    val dir = "/root/testdata/sf0.001"
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), graft.analyze.Tokenizer.tokenize(r.getString(1))))
      .filter(_._2.length >= 2)
      .map { case (id, toks) =>
        val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val n = bigrams.length.toLong
        val dup = n - bigrams.distinct.length.toLong
        (id, n, dup, (20000L * dup + n) / (2L * n))
      }.sortBy(_._1).toSeq
    val got = TextAnalysis.repetition(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0), "no repeated bigram in fixture — dup path untested")
  }
}
