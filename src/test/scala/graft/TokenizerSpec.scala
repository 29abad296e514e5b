package graft

import org.apache.spark.sql.functions._

import graft.analyze.Tokenizer

/** Tokenizer purity + Scala/Column parity: the oracle (Scala) and the
  * distributed build (Column) must tokenize identically.
  */
class TokenizerSpec extends SparkSpec {

  test("scala tokenizer basics") {
    assert(Tokenizer.tokenize("Hello, World_2!").sameElements(Array("hello", "world", "2")))
    assert(Tokenizer.tokenize("").isEmpty)
    assert(Tokenizer.tokenize("  ., !").isEmpty)
    assert(Tokenizer.tokenize(null).isEmpty)
    assert(Tokenizer.tokenize("def foo(x: Int) = x*2")
      .sameElements(Array("def", "foo", "x", "int", "x", "2")))
  }

  test("column tokenizer matches scala tokenizer on the synthetic corpus") {
    import spark.implicits._
    val docs = graft.corpus.CorpusGen.generateLocal(50)
    val viaCol = docs.map(_.content).toDF("content")
      .select(Tokenizer.tokensCol(col("content")).as("toks"))
      .as[Seq[String]].collect()
    val viaScala = docs.map(d => Tokenizer.tokenize(d.content).toSeq)
    viaCol.zip(viaScala).foreach { case (a, b) => assert(a == b) }
  }
}
