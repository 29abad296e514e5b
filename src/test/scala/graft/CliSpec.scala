package graft

import java.nio.file.Files

import graft.corpus.CorpusGen
import graft.index.Searcher

/** The spark-submit entrypoint ([[Cli]]) must be a thin veneer: every
  * subcommand's output is pinned to the library call it wraps, and a
  * re-submitted build resumes (skips committed stages) instead of
  * rebuilding — the north rule's deployment contract.
  */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 200
  private lazy val docsPath = {
    val dir = Files.createTempDirectory("graft-cli-docs-").toString
    spark.range(0, nDocs).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val root = {
    val r = Files.createTempDirectory("graft-cli-idx-").toString + "/idx"
    val out = Cli.run(spark, Array("build", docsPath, r, "--buckets", "4", "--positions"))
    assert(out == Seq(s"built root=$r docs=$nDocs terms=" +
      s"${new Searcher(spark, r).stats.nTerms} postings=" +
      s"${new Searcher(spark, r).stats.totalPostings} buckets=4 positions=true"))
    r
  }

  test("build then re-build resumes: identical stats line, stages skipped") {
    val first = root // force the build
    val again = Cli.run(spark, Array("build", docsPath, first, "--buckets", "4", "--positions"))
    assert(again.head.startsWith(s"built root=$first docs=$nDocs "))
  }

  test("search subcommand output equals the library call") {
    val q = CorpusGen.querySet(5).map(_._2).find(_.split(" ").length > 1).get
    val want = new Searcher(spark, root).search(q, 10).collect()
      .map(r => s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}").toSeq
    val got = Cli.run(spark, ("search" +: root +: "10" +: q.split(" ").toSeq).toArray)
    assert(want.nonEmpty && got == want)
  }

  test("search-batch reads one query per line and equals searchMany") {
    val queries = CorpusGen.querySet(4)
    val f = Files.createTempFile("graft-cli-q-", ".txt")
    Files.writeString(f, queries.map(_._2).mkString("\n"))
    val want = new Searcher(spark, root).searchMany(queries.map { case (i, q) => (i, q) }, 5)
      .collect()
      .map(r => s"${r.getAs[Int]("query_id")}\t${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}")
      .toSeq
    val got = Cli.run(spark, Array("search-batch", root, "5", f.toString))
    assert(want.nonEmpty && got == want)
  }

  test("stats prints the index scalars plus one row per bucket") {
    val out = Cli.run(spark, Array("stats", root))
    assert(out.head.contains(s"docs=$nDocs") && out.head.contains("buckets=4") &&
      out.head.contains("positions=true"))
    assert(out(1) == "bucket\tn_docs\tn_tokens\tn_terms\tn_postings")
    assert(out.length == 2 + 4) // 4 buckets
  }

  test("fsck reports a clean index (all bad_* counters zero)") {
    val out = Cli.run(spark, Array("fsck", root))
    assert(out.length == 1)
    Seq("bad_df=0", "bad_dict=0", "bad_doclen=0", "bad_meta=0", "bad_pos=0")
      .foreach(m => assert(out.head.contains(m), s"$m missing from: ${out.head}"))
  }

  // second generation: disjoint doc-id range, its own geometry
  private lazy val root2 = {
    val dir2 = Files.createTempDirectory("graft-cli-docs2-").toString
    spark.range(nDocs, nDocs + 100)
      .map(i => (i, CorpusGen.genDoc(43L, i).content)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir2)
    val r = Files.createTempDirectory("graft-cli-idx2-").toString + "/idx"
    Cli.run(spark, Array("build", dir2, r, "--buckets", "2"))
    r
  }

  test("comma-separated roots run the multi-generation scatter-gather") {
    val q = CorpusGen.querySet(5).map(_._2).find(_.split(" ").length > 1).get
    val want = new graft.index.MultiSearcher(spark, Seq(root, root2)).search(q, 10)
      .collect().map(r => s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}").toSeq
    val got = Cli.run(spark, ("search" +: s"$root,$root2" +: "10" +: q.split(" ").toSeq).toArray)
    assert(want.nonEmpty && got == want)
  }

  test("merge with --tombstones drops the listed doc ids") {
    val tombDir = Files.createTempDirectory("graft-cli-tomb-").toString + "/t"
    Seq(0L, 1L, 2L).toDF("doc_id").write.parquet(tombDir)
    val out = Files.createTempDirectory("graft-cli-merged-").toString + "/idx"
    val lines = Cli.run(spark,
      Array("merge", out, root, root2, "--tombstones", tombDir, "--buckets", "3"))
    val survivors = new Searcher(spark, out).stats.nDocs
    assert(survivors == nDocs + 100 - 3)
    assert(lines.head.contains(s"docs=$survivors") && lines.head.contains("tombstoned=true"))
    // a tombstoned doc never surfaces again
    val q = CorpusGen.querySet(5).map(_._2).head
    val ids = Cli.run(spark, ("search" +: out +: "1000" +: q.split(" ").toSeq).toArray)
      .map(_.split("\t").head.toLong)
    assert(ids.forall(_ > 2L))
  }

  test("generations built with a shared --bucket-size merge bucket-aligned") {
    // the LSM fast path: same docId-bucket width in both generations →
    // SegmentMerger dispatches to mergeAligned, whose discriminator is
    // the ABSENCE of a tokens table in the merged root (no
    // decode-and-rebuild happened)
    def gen(lo: Long, hi: Long, seed: Long): String = {
      val d = Files.createTempDirectory("graft-cli-bs-docs-").toString
      spark.range(lo, hi).map(i => (i, CorpusGen.genDoc(seed, i).content))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(d)
      val r = Files.createTempDirectory("graft-cli-bs-idx-").toString + "/idx"
      Cli.run(spark, Array("build", d, r, "--bucket-size", "64"))
      r
    }
    val (g1, g2) = (gen(0, 150, 42L), gen(150, 250, 43L))
    val out = Files.createTempDirectory("graft-cli-bs-merged-").toString + "/idx"
    val line = Cli.run(spark, Array("merge", out, g1, g2)).head
    assert(line.contains("docs=250"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/tokens")),
      "aligned merge must not leave a tokens table (rebuild-path artifact)")
    // merged index answers identically to the multi-generation view
    val q = CorpusGen.querySet(5).map(_._2).head
    val merged = Cli.run(spark, ("search" +: out +: "10" +: q.split(" ").toSeq).toArray)
    val multi = Cli.run(spark, ("search" +: s"$g1,$g2" +: "10" +: q.split(" ").toSeq).toArray)
    assert(merged.nonEmpty && merged == multi)
  }

  test("fsckClean separates clean reports from damaged ones") {
    assert(Cli.fsckClean(Seq("n_docs=5 bad_df=0 bad_dict=0 bad_pos=0")))
    assert(!Cli.fsckClean(Seq("n_docs=5 bad_df=0 bad_dict=3 bad_pos=0")))
    assert(Cli.fsckClean(Cli.run(spark, Array("fsck", root))))
  }

  test("unknown commands and malformed options fail loudly") {
    intercept[IllegalArgumentException](Cli.run(spark, Array("frobnicate")))
    intercept[IllegalArgumentException](
      Cli.run(spark, Array("build", docsPath, "/tmp/x", "--no-such-flag")))
    intercept[IllegalArgumentException](
      Cli.run(spark, Array("build", docsPath, "/tmp/x", "--buckets")))
  }
}
