package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Column aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing.
  *
  * Every query is written to be deterministic as a sorted relation: outputs
  * carry an ORDER BY over a unique key in BOTH engines, and float outputs
  * are rounded where the two engines could differ in summation order.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    bench: Boolean)(
    val fn: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Q =
    new Q(name, Some(oracle), bench)(fn)

  /** Operator whose semantics aren't SQL-expressible → driver records a
    * weaker rows-only check; correctness lives in the ScalaTest spec.
    */
  def noOracle(name: String, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Q =
    new Q(name, None, bench)(fn)
}
