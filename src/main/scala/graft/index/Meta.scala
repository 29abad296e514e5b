package graft.index

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Plain-file metadata I/O for the index (Iceberg keeps table metadata in
  * JSON files, not data-format scans — same here): stats as a properties
  * file, the manifest as JSONL. Driver-side microseconds instead of a
  * Spark job per read/write.
  */
object Meta {

  def writeStats(root: String, s: IndexStats): Unit = {
    val text =
      s"""nDocs=${s.nDocs}
         |totalTokens=${s.totalTokens}
         |nTerms=${s.nTerms}
         |totalPostings=${s.totalPostings}
         |bucketSize=${s.bucketSize}
         |nBuckets=${s.nBuckets}
         |""".stripMargin
    Files.writeString(Paths.get(root, "stats.properties"), text)
  }

  def readStats(root: String): IndexStats = {
    val kv = Files.readString(Paths.get(root, "stats.properties"))
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); (k, v) }
      .toMap
    IndexStats(kv("nDocs").toLong, kv("totalTokens").toLong, kv("nTerms").toLong,
      kv("totalPostings").toLong, kv("bucketSize").toLong, kv("nBuckets").toInt)
  }

  /** JSON string escape — stage/path values may contain quotes or
    * backslashes; unescaped interpolation would corrupt the JSONL.
    */
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        sb.append(s(i + 1) match {
          case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'; case c => c
        })
        i += 2
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** `memory_usage` / `serialized_length` analog
    * (/root/reference/c/usearch.h:139-252): on-disk byte sizes per index
    * component from filesystem metadata — no data scan (the sizes live
    * in the directory listings the Parquet reader consults anyway).
    */
  def byteSizes(root: String): Seq[(String, Long, Long)] = {
    def sizeOf(dir: java.nio.file.Path): (Long, Long) = {
      if (!Files.exists(dir)) return (0L, 0L)
      val s = Files.walk(dir)
      try {
        var files = 0L
        var bytes = 0L
        s.filter(Files.isRegularFile(_)).forEach { p =>
          files += 1
          bytes += Files.size(p)
        }
        (files, bytes)
      } finally s.close()
    }
    Seq("tokens", "segments", "doclens", "dict").map { c =>
      val (files, bytes) = sizeOf(Paths.get(root, c))
      (c, files, bytes)
    }
  }

  def appendManifest(root: String, rows: Seq[ManifestRow]): Unit = {
    val sb = new StringBuilder
    rows.foreach { m =>
      sb.append(s"""{"snapshotId":${m.snapshotId},"stage":"${esc(m.stage)}","partitionId":${m.partitionId},""" +
        s""""path":"${esc(m.path)}","rows":${m.rows},"elapsedMs":${m.elapsedMs},"status":"${esc(m.status)}"}""").append('\n')
    }
    Files.writeString(Paths.get(root, "manifest.jsonl"), sb.toString,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def readManifest(root: String): Seq[ManifestRow] = {
    val p = Paths.get(root, "manifest.jsonl")
    if (!Files.exists(p)) Seq.empty
    else Files.readString(p).linesIterator.filter(_.nonEmpty).map { l =>
      // value regex stops at the first UNESCAPED quote
      def str(k: String) = s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r
        .findFirstMatchIn(l).map(m => unesc(m.group(1))).getOrElse("")
      def num(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L)
      ManifestRow(num("snapshotId"), str("stage"), num("partitionId").toInt,
        str("path"), num("rows"), num("elapsedMs"), str("status"))
    }.toSeq
  }
}
