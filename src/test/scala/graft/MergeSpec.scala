package graft

import java.nio.file.Files

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, MultiSearcher, Searcher, SegmentMerger}

/** LSM lifecycle invariants (the compact/isolate analogs):
  * - merged(gen A, gen B) ≡ fresh build over A ∪ B (search-identical)
  * - MultiSearcher(A, B) with global stats ≡ single-index search
  * - tombstoned merge ≡ fresh build over the surviving docs
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val n = 200
  private val half = 100

  private def corpusDf(from: Long, until: Long) =
    spark.range(from, until).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")

  private def tmp(tag: String) = Files.createTempDirectory(s"graft-merge-$tag-").toString

  private lazy val fullRoot = {
    val r = tmp("full")
    IndexBuilder.build(spark, corpusDf(0, n), r, targetBuckets = 4)
    r
  }
  private lazy val genA = {
    val r = tmp("a")
    IndexBuilder.build(spark, corpusDf(0, half), r, targetBuckets = 3)
    r
  }
  private lazy val genB = {
    val r = tmp("b")
    IndexBuilder.build(spark, corpusDf(half, n), r, targetBuckets = 2)
    r
  }

  private def topk(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.as[(Long, Double)].collect().toSeq

  private val queries = CorpusGen.querySet(12)

  test("multi-generation scatter-gather equals single-index search (Indexes analog)") {
    val single = new Searcher(spark, fullRoot)
    val multi = new MultiSearcher(spark, Seq(genA, genB))
    assert(multi.nDocs == single.stats.nDocs)
    assert(multi.avgdl == single.stats.avgdl)
    queries.foreach { case (qid, q) =>
      assert(topk(multi.search(q, 10)) == topk(single.search(q, 10)), s"q$qid '$q'")
    }
  }

  test("multi-generation batched searchMany equals single-index batched searchMany") {
    // the TAAT batch path across generations: each shard scores with the
    // injected global stats, partials union, ONE global bounded merge —
    // so streamed, uncompacted tables get batched search too
    val single = new Searcher(spark, fullRoot)
    val multi = new MultiSearcher(spark, Seq(genA, genB))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Double)] =
      df.select("query_id", "doc_id", "score").as[(Int, Long, Double)].collect().toSeq
    assert(rows(multi.searchMany(queries, 10)) == rows(single.searchMany(queries, 10)))
  }

  test("LSM merge of two generations equals a fresh full build") {
    val out = tmp("merged")
    val mergedStats = SegmentMerger.merge(spark, Seq(genA, genB), out, targetBuckets = 4)
    val single = new Searcher(spark, fullRoot)
    assert(mergedStats.nDocs == single.stats.nDocs)
    assert(mergedStats.totalTokens == single.stats.totalTokens)
    assert(mergedStats.nTerms == single.stats.nTerms)
    assert(mergedStats.totalPostings == single.stats.totalPostings)
    val merged = new Searcher(spark, out)
    queries.foreach { case (qid, q) =>
      assert(topk(merged.search(q, 10)) == topk(single.search(q, 10)), s"q$qid '$q'")
    }
  }

  test("bucket-aligned merge (shared fixedBucketSize) equals a fresh full build") {
    // generations pinned to one bucketSize (the steady-state LSM shape);
    // merge() must dispatch to the aligned path — whose discriminator is
    // that it never writes a tokens table — and still be search-identical
    // to the fresh build, block-max summaries re-encoded under the
    // merged avgdl included
    val a = tmp("ba"); val b = tmp("bb")
    IndexBuilder.build(spark, corpusDf(0, half), a, fixedBucketSize = 40)
    IndexBuilder.build(spark, corpusDf(half, n), b, fixedBucketSize = 40)
    val out = tmp("bmerged")
    val st = SegmentMerger.merge(spark, Seq(a, b), out)
    assert(!Files.exists(java.nio.file.Paths.get(out, "tokens")),
      "shared-geometry merge must take the aligned path (no tf rebuild)")
    val single = new Searcher(spark, fullRoot)
    assert(st.nDocs == single.stats.nDocs)
    assert(st.totalTokens == single.stats.totalTokens)
    assert(st.nTerms == single.stats.nTerms)
    assert(st.totalPostings == single.stats.totalPostings)
    val merged = new Searcher(spark, out)
    queries.foreach { case (qid, q) =>
      assert(topk(merged.search(q, 10)) == topk(single.search(q, 10)), s"q$qid '$q'")
    }
  }

  test("bucket-aligned tombstoned merge equals the rebuild path's result") {
    // bucketSize 33: bucket 3 (docs 99-131) SPANS both generations, so
    // the per-bucket k-way merge of same-bucket lists from different
    // generations is exercised, tombstones included
    val a = tmp("bta"); val b = tmp("btb")
    IndexBuilder.build(spark, corpusDf(0, half), a, fixedBucketSize = 33)
    IndexBuilder.build(spark, corpusDf(half, n), b, fixedBucketSize = 33)
    val removed = (0L until n.toLong).filter(_ % 5 == 0)
    val ts = removed.toDF("doc_id")
    val outA = tmp("bt-aligned"); val outR = tmp("bt-rebuild")
    val stA = SegmentMerger.mergeAligned(spark, Seq(a, b), outA, Some(ts))
    val stR = SegmentMerger.mergeRebuild(spark, Seq(a, b), outR, Some(ts), targetBuckets = 4)
    assert(stA.nDocs == stR.nDocs)
    assert(stA.totalTokens == stR.totalTokens)
    assert(stA.nTerms == stR.nTerms)
    assert(stA.totalPostings == stR.totalPostings)
    val ma = new Searcher(spark, outA)
    val mr = new Searcher(spark, outR)
    queries.foreach { case (qid, q) =>
      assert(topk(ma.search(q, 10)) == topk(mr.search(q, 10)), s"q$qid '$q'")
    }
    queries.foreach { case (_, q) =>
      assert(topk(ma.search(q, 50)).map(_._1).forall(_ % 5 != 0))
    }
  }

  test("merged ≡ fresh build when the corpus holds zero-token docs (N counts empties)") {
    // every 10th doc is punctuation-only → tokenizes to nothing. A fresh
    // build counts it in BM25's N (corpus.count()); the merge paths see
    // only doclens (tokened docs), so they reconstruct N from the
    // generations' meta counts. Empty files are ubiquitous in web-scale
    // source corpora — without this rule merged scores drift from fresh.
    def df(from: Long, until: Long) = spark.range(from, until)
      .map(i => (i, if (i % 10 == 0) "//!! ??" else CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    val full = tmp("zt-full"); val a = tmp("zt-a"); val b = tmp("zt-b")
    IndexBuilder.build(spark, df(0, n), full, fixedBucketSize = 33)
    IndexBuilder.build(spark, df(0, half), a, fixedBucketSize = 33)
    IndexBuilder.build(spark, df(half, n), b, fixedBucketSize = 33)
    val outA = tmp("zt-aligned"); val outR = tmp("zt-rebuild")
    val stA = SegmentMerger.mergeAligned(spark, Seq(a, b), outA)
    val stR = SegmentMerger.mergeRebuild(spark, Seq(a, b), outR, targetBuckets = 4)
    val sf = new Searcher(spark, full)
    assert(sf.stats.nDocs == n && stA.nDocs == n.toLong && stR.nDocs == n.toLong,
      s"N must count zero-token docs: fresh=${sf.stats.nDocs} aligned=${stA.nDocs} rebuild=${stR.nDocs}")
    val sa = new Searcher(spark, outA); val sr = new Searcher(spark, outR)
    queries.foreach { case (qid, q) =>
      val want = topk(sf.search(q, 10))
      assert(topk(sa.search(q, 10)) == want, s"aligned q$qid '$q'")
      assert(topk(sr.search(q, 10)) == want, s"rebuild q$qid '$q'")
    }
  }

  test("aligned tombstoned merge survives an entirely-emptied bucket") {
    // tombstoning EVERY doc of bucket 1 (ids 33..65 at bucketSize 33)
    // exercises the empty-bucket geometry: doclens must drop the bucket,
    // searches must skip it, and the integrity audit must stay clean —
    // the compaction shape a retention policy (delete a whole time
    // range) produces in production.
    val a = tmp("ebta"); val b = tmp("ebtb")
    IndexBuilder.build(spark, corpusDf(0, half), a, fixedBucketSize = 33)
    IndexBuilder.build(spark, corpusDf(half, n), b, fixedBucketSize = 33)
    val removed = (33L until 66L) ++ Seq(5L, 150L)
    val ts = removed.toDF("doc_id")
    val outA = tmp("ebt-aligned"); val outR = tmp("ebt-rebuild")
    val stA = SegmentMerger.mergeAligned(spark, Seq(a, b), outA, Some(ts))
    val stR = SegmentMerger.mergeRebuild(spark, Seq(a, b), outR, Some(ts), targetBuckets = 4)
    assert(stA.nDocs == stR.nDocs && stA.totalTokens == stR.totalTokens &&
      stA.nTerms == stR.nTerms && stA.totalPostings == stR.totalPostings)
    val ma = new Searcher(spark, outA)
    val mr = new Searcher(spark, outR)
    val gone = removed.toSet
    queries.foreach { case (qid, q) =>
      val hits = topk(ma.search(q, 50))
      assert(hits == topk(mr.search(q, 50)), s"q$qid '$q'")
      assert(hits.forall(h => !gone.contains(h._1)), s"q$qid leaked a tombstone")
    }
    val rep = ma.integrityReport().collect().head
    Seq("bad_df", "bad_dict", "bad_doclen", "bad_meta")
      .foreach(c => assert(rep.getAs[Long](c) == 0L, s"$c nonzero"))
  }

  test("an all-zero-token generation builds, serves empty, and merges cleanly") {
    // a micro-batch whose every doc tokenizes to nothing (binary files
    // stripped bare) must still produce a VALID index: N counts the docs,
    // zero terms, searches dead at planning — not a crashed build or an
    // unreadable schema-less segments dir (partitionBy writes create
    // files lazily; ensureReadableWhenEmpty guards it).
    val z = tmp("zgen")
    val zdf = spark.range(half, half + 40L).map(i => (i, "//?? !!"))
      .toDF("doc_id", "content")
    val st = IndexBuilder.build(spark, zdf, z, fixedBucketSize = 33)
    assert(st.nDocs == 40 && st.nTerms == 0 && st.totalPostings == 0)
    IndexBuilder.buildPositions(spark, zdf, z, textCol = "content")
    val sz = new Searcher(spark, z)
    assert(sz.hasPositions)
    assert(sz.search("def", 5).collect().isEmpty)
    // merged with a real generation ≡ fresh build over the union corpus
    val a = tmp("zma"); val out = tmp("zmerge"); val full = tmp("zmfull")
    IndexBuilder.build(spark, corpusDf(0, half), a, fixedBucketSize = 33)
    val stM = SegmentMerger.mergeAligned(spark, Seq(a, z), out)
    assert(stM.nDocs == half + 40L, s"merged N=${stM.nDocs}")
    IndexBuilder.build(spark, corpusDf(0, half).union(zdf), full, fixedBucketSize = 33)
    val sf = new Searcher(spark, full); val sm = new Searcher(spark, out)
    queries.foreach { case (qid, q) =>
      assert(topk(sm.search(q, 10)) == topk(sf.search(q, 10)), s"q$qid '$q'")
    }
    // the PRE-merge serving view must agree too: scatter-gather with the
    // zero-term generation in the mix (its N counts, its shards are dead)
    val ms = new MultiSearcher(spark, Seq(a, z))
    queries.foreach { case (qid, q) =>
      assert(topk(ms.search(q, 10)) == topk(sf.search(q, 10)), s"multi q$qid '$q'")
    }
  }

  test("high-offset generation (doc ids past Int.Max) scores offset-independently") {
    // a generation late in a 10¹²-doc streamed ingest carries huge id
    // offsets; with an adequate bucket width the index must behave
    // exactly like the same corpus at offset 0 (ids shifted, scores and
    // ranks identical), and an inadequate width must fail LOUDLY at
    // build time instead of silently wrapping bucket ids
    val off = 3000000000L // > Int.MaxValue
    val base = tmp("ho-base"); val high = tmp("ho-high")
    IndexBuilder.build(spark, corpusDf(0, 60), base, fixedBucketSize = 1L << 20)
    val hdf = spark.range(0, 60)
      .map(i => (i + off, CorpusGen.genDoc(42L, i).content)).toDF("doc_id", "content")
    IndexBuilder.build(spark, hdf, high, fixedBucketSize = 1L << 20)
    val sb = new Searcher(spark, base); val sh = new Searcher(spark, high)
    queries.foreach { case (qid, q) =>
      val want = topk(sb.search(q, 10)).map { case (id, s) => (id + off, s) }
      assert(topk(sh.search(q, 10)) == want, s"q$qid '$q'")
    }
    val e = intercept[IllegalArgumentException] {
      IndexBuilder.build(spark, hdf, tmp("ho-bad"), fixedBucketSize = 1L)
    }
    assert(e.getMessage.contains("bucket id overflow"))
  }

  test("aligned merge rejects generations holding the same doc id") {
    // an update ingested without tombstoning its old revision would
    // silently double that doc's postings — the merge must fail loudly
    val a = tmp("ovA"); val c = tmp("ovC")
    IndexBuilder.build(spark, corpusDf(0, 100), a, fixedBucketSize = 50)
    IndexBuilder.build(spark, corpusDf(50, 150), c, fixedBucketSize = 50)
    val out = tmp("ovM")
    val e = intercept[Exception] {
      SegmentMerger.mergeAligned(spark, Seq(a, c), out)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("more than one generation")),
      s"unexpected failure: ${messages(e)}")
  }

  test("update lifecycle: tombstone old version + ingest new version (update analog)") {
    // the reference's `update` replaces a member in place
    // (/root/reference/include/usearch/index.hpp:2911-2999); content-
    // addressed ids make the Spark analog: tombstone the old commit's doc,
    // ingest the new commit as a new doc, compact.
    val oldId = 7L
    val newId = n.toLong // fresh id for the updated revision
    val newContent = "zzzupdated zzzupdated special marker content " +
      CorpusGen.genDoc(42L, oldId).content
    val updatedGen = tmp("upd")
    IndexBuilder.build(spark,
      Seq((newId, newContent)).toDF("doc_id", "content"), updatedGen, targetBuckets = 1)

    val out = tmp("upd-merged")
    SegmentMerger.merge(spark, Seq(genA, genB, updatedGen), out,
      tombstones = Some(Seq(oldId).toDF("doc_id")), targetBuckets = 3)
    val s = new Searcher(spark, out)
    assert(s.stats.nDocs == n.toLong) // -1 removed, +1 added

    // the new revision is findable by its marker term; the old id is gone
    val hits = topk(s.search("zzzupdated marker", 5))
    assert(hits.nonEmpty && hits.head._1 == newId)
    val all = topk(s.search("def id0 id1 id2", n))
    assert(!all.exists(_._1 == oldId))
  }

  test("tombstoned merge equals a fresh build over surviving docs (remove/isolate analog)") {
    val removed = (0L until n.toLong).filter(_ % 7 == 0)
    val tombstones = removed.toDF("doc_id")
    val out = tmp("tombstoned")
    SegmentMerger.merge(spark, Seq(genA, genB), out, Some(tombstones), targetBuckets = 3)

    val survivorRoot = tmp("survivors")
    val survivors = corpusDf(0, n).where(!$"doc_id".isin(removed: _*))
    IndexBuilder.build(spark, survivors, survivorRoot, targetBuckets = 4)

    val merged = new Searcher(spark, out)
    val fresh = new Searcher(spark, survivorRoot)
    assert(merged.stats.nDocs == fresh.stats.nDocs)
    assert(merged.stats.totalPostings == fresh.stats.totalPostings)
    queries.foreach { case (qid, q) =>
      assert(topk(merged.search(q, 10)) == topk(fresh.search(q, 10)), s"q$qid '$q'")
    }
    // removed docs never surface
    queries.foreach { case (_, q) =>
      val hits = topk(merged.search(q, 50)).map(_._1)
      assert(hits.forall(id => id % 7 != 0))
    }
  }
}
