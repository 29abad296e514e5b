package graft.corpus

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One row of the synthesized source-code corpus — shape fixed by the
  * north rule's input_hint: (repo, path, commit, lang, content) plus the
  * sha256 integrity column verified per row.
  */
final case class CorpusDoc(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha256: String)

/** Deterministic, platform-independent synthesizer of a source-code
  * corpus. Analog of the reference's seeded random test inputs
  * (/root/reference/python/scripts/test_index.py:63-64,
  * /root/reference/cpp/test.cpp:923-932), reshaped to text.
  *
  * Every field of every row is a pure function of (seed, docIndex): the
  * generator uses a counter-based splitmix64 PRNG, so the corpus is
  * byte-identical regardless of partitioning, task order, or JVM. The
  * identifier pool is Zipf-distributed so hot terms exist (exercises the
  * skew/salting path) alongside rare identifiers (high-idf path).
  */
object CorpusGen {

  private val Langs = Array("scala", "java", "python", "c", "markdown")
  // skewed language mix
  private val LangCdf = Array(0.35, 0.60, 0.85, 0.95, 1.0)

  private val KeywordsByLang: Map[String, Array[String]] = Map(
    "scala" -> Array("def", "val", "object", "class", "match", "case", "extends", "import"),
    "java" -> Array("public", "static", "void", "class", "final", "new", "return", "import"),
    "python" -> Array("def", "class", "import", "return", "self", "lambda", "yield", "with"),
    "c" -> Array("int", "void", "struct", "static", "return", "include", "sizeof", "const"),
    "markdown" -> Array("the", "a", "to", "and", "in", "of", "for", "with"))

  private val ExtByLang: Map[String, String] = Map(
    "scala" -> "scala", "java" -> "java", "python" -> "py", "c" -> "c", "markdown" -> "md")

  /** Identifier pool: idents "id<k>" with Zipf(1.0)-ish popularity —
    * ident 0 is ~poolSize× hotter than ident poolSize-1.
    */
  final val IdentPoolSize = 2000
  private val identCdf: Array[Double] = {
    val w = Array.tabulate(IdentPoolSize)(i => 1.0 / (i + 1).toDouble)
    val total = w.sum
    val cdf = new Array[Double](IdentPoolSize)
    var acc = 0.0
    var i = 0
    while (i < IdentPoolSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(IdentPoolSize - 1) = 1.0
    cdf
  }

  /** splitmix64 — counter-based, platform-independent. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def unit(seed: Long, streams: Long*): Double = {
    var h = seed
    streams.foreach(s => h = mix64(h ^ s))
    // 53-bit mantissa → [0, 1)
    (mix64(h) >>> 11).toDouble / (1L << 53).toDouble
  }

  private def pickCdf(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    val idx = if (i >= 0) i else -i - 1
    math.min(idx, cdf.length - 1)
  }

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  private def hex40(seed: Long, a: Long, b: Long): String = {
    val h1 = mix64(seed ^ a)
    val h2 = mix64(h1 ^ b)
    val h3 = mix64(h2 + 0x51L)
    f"$h1%016x$h2%016x${h3 & 0xffffffffL}%08x"
  }

  /** Pure generation of doc `i` — no shared state. */
  def genDoc(seed: Long, i: Long): CorpusDoc = {
    val orgId = (mix64(seed ^ (i * 31 + 7)) >>> 33) % 40
    val repoId = (mix64(seed ^ (i * 17 + 3)) >>> 33) % 3 + orgId * 3
    val repo = f"org$orgId%03d/repo$repoId%03d"
    val lang = Langs(pickCdf(LangCdf, unit(seed, i, 1L)))
    val dirDepth = 1 + (unit(seed, i, 2L) * 3).toInt
    val dirs = (0 until dirDepth)
      .map(d => s"pkg${(mix64(seed ^ i ^ (d + 11L)) >>> 40) % 20}")
      .mkString("/")
    val path = s"src/$dirs/File${i}.${ExtByLang(lang)}"
    val commit = hex40(seed, i, 0xc0117L)
    val keywords = KeywordsByLang(lang)
    val nLines = 5 + (unit(seed, i, 3L) * 45).toInt
    val sb = new StringBuilder
    var line = 0
    while (line < nLines) {
      val nTok = 3 + (unit(seed, i, line * 7L + 5L) * 8).toInt
      var t = 0
      while (t < nTok) {
        val u = unit(seed, i, line * 131L + t * 13L + 17L)
        val word =
          if (u < 0.3) keywords(((u * 1000).toInt) % keywords.length)
          else {
            val ident = pickCdf(identCdf, unit(seed, i, line * 131L + t * 13L + 19L))
            s"id$ident"
          }
        if (t > 0) sb.append(' ')
        sb.append(word)
        t += 1
      }
      sb.append('\n')
      line += 1
    }
    val content = sb.toString
    CorpusDoc(repo, path, commit, lang, content, sha256Hex(content))
  }

  /** Distributed generation: `spark.range` partitions the id space; each
    * row is generated independently from its id, so the result is
    * identical at any parallelism.
    */
  def generate(spark: SparkSession, nDocs: Long, seed: Long = 42L): Dataset[CorpusDoc] = {
    import spark.implicits._
    spark.range(0L, nDocs).map(i => genDoc(seed, i))
  }

  /** Local (driver-side) generation for small oracle fixtures. */
  def generateLocal(nDocs: Int, seed: Long = 42L): IndexedSeq[CorpusDoc] =
    (0 until nDocs).map(i => genDoc(seed, i.toLong))

  /** Deterministic reference query set: mix of rare identifiers, hot
    * keywords, and absent terms (FIXTURES.md §2).
    */
  def querySet(n: Int = 50, seed: Long = 42L): IndexedSeq[(Int, String)] = {
    (0 until n).map { q =>
      val nTerms = 1 + (unit(seed ^ 0x9e5L, q.toLong, 1L) * 4).toInt
      val terms = (0 until nTerms).map { t =>
        val u = unit(seed ^ 0x5eedL, q.toLong, t * 7L + 2L)
        if (u < 0.2) "def" // hot keyword
        else if (u < 0.3) "zzznotaterm" // absent
        else s"id${pickCdf(identCdf, u)}"
      }
      (q, terms.mkString(" "))
    }
  }
}
