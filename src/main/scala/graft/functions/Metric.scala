package graft.functions

import org.apache.spark.sql.Column

/** Declared scoring metric — the user-defined-metric surface
  * (`metric_punned_t` + `CompiledMetric` registration,
  * /root/reference/include/usearch/index_plugins.hpp:1660-1788,
  * /root/reference/python/usearch/index.py:90-130): a named, serializable
  * Column→Column scorer that similarity operators take as a parameter.
  * Any user object implementing the trait is a drop-in metric; the
  * built-ins mirror the reference's `metric_kind_t` enum.
  */
trait Metric extends Serializable {
  def name: String
  /** Distance (smaller = closer) between two vector columns. */
  def apply(a: Column, b: Column): Column
}

object Metric {

  private def m(n: String)(f: (Column, Column) => Column): Metric = new Metric {
    val name: String = n
    def apply(a: Column, b: Column): Column = f(a, b)
  }

  val Cos: Metric = m("cos")(Distances.cosineDistance)
  val Ip: Metric = m("ip")(Distances.innerDistance)
  val L2sq: Metric = m("l2sq")(Distances.l2sqDistance)
  val Jaccard: Metric = m("jaccard")(Distances.jaccardDistance)
  val Tanimoto: Metric = m("tanimoto")(Distances.tanimotoDistance)
  val Sorensen: Metric = m("sorensen")(Distances.sorensenDistance)
  val Pearson: Metric = m("pearson")(Distances.pearsonDistance)
  val Divergence: Metric = m("divergence")(Distances.jsDivergence)

  /** Name → metric, the `metric_from_name` analog. */
  val registry: Map[String, Metric] =
    Seq(Cos, Ip, L2sq, Jaccard, Tanimoto, Sorensen, Pearson, Divergence)
      .map(mt => mt.name -> mt).toMap

  def apply(name: String): Metric = registry.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown metric '$name' (have ${registry.keys.toSeq.sorted.mkString(", ")})"))
}
