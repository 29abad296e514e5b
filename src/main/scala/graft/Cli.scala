package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, Searcher, SegmentMerger}

/** Production entrypoint for spark-submit deployments (the north rule's
  * "runs via spark-submit at 10^12-file scale" shape). Subcommands wrap
  * the library's build / search / merge / stats / fsck surfaces; the
  * session master comes from spark-submit's `--master` when present —
  * `local[*]` is only the bare-JVM dev fallback, so the same jar drives
  * a laptop and a 1000-executor cluster unchanged.
  *
  * {{{
  * spark-submit --class graft.Cli graft.jar build <docs.parquet> <indexRoot> \
  *     [--buckets N] [--positions] [--id-col doc_id] [--text-col text]
  * spark-submit --class graft.Cli graft.jar search <indexRoot> <k> <query words...>
  * spark-submit --class graft.Cli graft.jar search-batch <indexRoot> <k> <queries.txt>
  * spark-submit --class graft.Cli graft.jar merge <outRoot> <root1> <root2> ...
  * spark-submit --class graft.Cli graft.jar stats <indexRoot>
  * spark-submit --class graft.Cli graft.jar fsck <indexRoot>
  * }}}
  *
  * Builds are checkpoint-resumable: re-submitting an interrupted `build`
  * with the same arguments skips committed stages (IndexBuilder's
  * per-stage status files + lineage manifest), so a preempted cluster
  * job finishes on resubmit instead of restarting.
  */
object Cli {

  val usage: String =
    """usage: graft.Cli <command> ...
      |  build <docs.parquet> <indexRoot> [--buckets N | --bucket-size W] [--positions] [--id-col doc_id] [--text-col text]
      |  search <indexRoot[,root2,...]> <k> <query words...>
      |  search-batch <indexRoot[,root2,...]> <k> <queries.txt>  # one query per line; ids are line numbers
      |  merge <outRoot> <root1> <root2> ... [--tombstones docids.parquet] [--buckets N]
      |  stats <indexRoot>
      |  fsck <indexRoot>""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val builder = SparkSession.builder().appName(s"graft-${args(0)}")
    // spark-submit --master sets spark.master before main runs; only a
    // bare `java -cp` launch takes the local fallback.
    val spark =
      (if (sys.props.contains("spark.master")) builder
       else builder
         .master("local[*]")
         .config("spark.sql.shuffle.partitions",
           Runtime.getRuntime.availableProcessors().toString))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val out = run(spark, args)
      out.foreach(println)
      // fsck(8) semantics: report AND signal — a cron'd audit must fail
      // the job when the index is damaged, not just print counters
      if (args(0) == "fsck" && !fsckClean(out)) sys.exit(1)
    } finally spark.stop()
  }

  /** True iff an `fsck` report carries no nonzero bad_* counter. */
  def fsckClean(lines: Seq[String]): Boolean =
    !lines.exists(_.split(" ").exists(kv =>
      kv.startsWith("bad_") && kv.split("=")(1).toLong != 0L))

  /** Dispatch, separated from session lifecycle so tests can drive every
    * subcommand with the suite's session. Returns the printable output.
    */
  def run(spark: SparkSession, args: Array[String]): Seq[String] = args(0) match {
    case "build" =>
      val (pos, opts) = parseOpts(args.drop(1).toSeq,
        flags = Set("--positions"),
        valued = Set("--buckets", "--bucket-size", "--id-col", "--text-col"))
      require(pos.length == 2, usage)
      val Seq(input, root) = pos
      val idCol = opts.getOrElse("--id-col", "doc_id")
      val textCol = opts.getOrElse("--text-col", "text")
      val docs = spark.read.parquet(input)
      // --bucket-size pins the docId-bucket width: generations built with
      // a SHARED width merge bucket-aligned (no decode-and-rebuild), the
      // LSM fast path a generational deployment wants.
      val st = IndexBuilder.build(spark, docs, root, idCol = idCol, textCol = textCol,
        targetBuckets = opts.get("--buckets").map(_.toInt).getOrElse(0),
        fixedBucketSize = opts.get("--bucket-size").map(_.toLong).getOrElse(0L))
      val withPositions = opts.contains("--positions")
      if (withPositions) IndexBuilder.buildPositions(spark, docs, root, idCol, textCol)
      Seq(s"built root=$root docs=${st.nDocs} terms=${st.nTerms} " +
        s"postings=${st.totalPostings} buckets=${st.nBuckets} positions=$withPositions")

    case "search" =>
      require(args.length >= 4, usage)
      val hits = searchOne(spark, args(1))(args.drop(3).mkString(" "), args(2).toInt)
      hits.collect().toSeq.map(r =>
        s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}")

    case "search-batch" =>
      require(args.length == 4, usage)
      import scala.jdk.CollectionConverters._
      val queries = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(args(3)))
        .asScala.toSeq.zipWithIndex.collect { case (q, i) if q.trim.nonEmpty => (i, q) }
      val df = searchBatch(spark, args(1))(queries, args(2).toInt)
      df.collect().toSeq.map(r => s"${r.getAs[Int]("query_id")}\t" +
        s"${r.getAs[Long]("doc_id")}\t${r.getAs[Double]("score")}")

    case "merge" =>
      val (pos, opts) = parseOpts(args.drop(1).toSeq,
        flags = Set.empty, valued = Set("--tombstones", "--buckets"))
      require(pos.length >= 2, usage)
      val tombs = opts.get("--tombstones")
        .map(p => spark.read.parquet(p).select("doc_id"))
      val st = SegmentMerger.merge(spark, pos.drop(1), pos.head, tombs,
        targetBuckets = opts.get("--buckets").map(_.toInt).getOrElse(0))
      Seq(s"merged ${pos.length - 1} roots into ${pos.head}: docs=${st.nDocs} " +
        s"terms=${st.nTerms} postings=${st.totalPostings} buckets=${st.nBuckets} " +
        s"tombstoned=${tombs.isDefined}")

    case "stats" =>
      require(args.length == 2, usage)
      val s = new Searcher(spark, args(1))
      val st = s.stats
      val header = s"docs=${st.nDocs} tokens=${st.totalTokens} terms=${st.nTerms} " +
        s"postings=${st.totalPostings} bucketSize=${st.bucketSize} " +
        s"buckets=${st.nBuckets} avgdl=${st.avgdl} positions=${s.hasPositions}"
      val levels = s.levelsStats().collect().toSeq
      header +: "bucket\tn_docs\tn_tokens\tn_terms\tn_postings" +:
        levels.map(r => (0 until 5).map(r.get(_).toString).mkString("\t"))

    case "fsck" =>
      require(args.length == 2, usage)
      val s = new Searcher(spark, args(1))
      val rep = s.integrityReport(checkPositions = s.hasPositions)
      val cols = rep.columns
      rep.collect().toSeq.map(r =>
        cols.indices.map(i => s"${cols(i)}=${r.get(i)}").mkString(" "))

    case other =>
      throw new IllegalArgumentException(s"unknown command '$other'\n$usage")
  }

  /** `search`/`search-batch` accept one root or a comma-separated list
    * of generation roots — the latter is the scatter-gather multi-index
    * query (disjoint doc-id spaces, global stats injected), so a
    * deployment can serve the L0+compacted generations before a merge.
    */
  private def searchOne(spark: SparkSession, rootsArg: String): (String, Int) => org.apache.spark.sql.DataFrame = {
    val roots = rootsArg.split(',').toSeq
    if (roots.length == 1) new Searcher(spark, roots.head).search(_, _)
    else new graft.index.MultiSearcher(spark, roots).search(_, _)
  }

  private def searchBatch(spark: SparkSession, rootsArg: String): (Seq[(Int, String)], Int) => org.apache.spark.sql.DataFrame = {
    val roots = rootsArg.split(',').toSeq
    if (roots.length == 1) new Searcher(spark, roots.head).searchMany(_, _)
    else new graft.index.MultiSearcher(spark, roots).searchMany(_, _)
  }

  /** Tiny option parser: `flags` are boolean switches, `valued` consume
    * the next token; anything else starting with `--` is an error.
    */
  private def parseOpts(tokens: Seq[String], flags: Set[String],
      valued: Set[String]): (Seq[String], Map[String, String]) = {
    val pos = Seq.newBuilder[String]
    var opts = Map.empty[String, String]
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (flags(t)) { opts += t -> "true"; i += 1 }
      else if (valued(t)) {
        require(i + 1 < tokens.length, s"$t needs a value\n$usage")
        opts += t -> tokens(i + 1); i += 2
      } else {
        require(!t.startsWith("--"), s"unknown option '$t'\n$usage")
        pos += t; i += 1
      }
    }
    (pos.result(), opts)
  }
}
