package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Advanced, Analytics, AqlQueries, Events, FullText, Multimodal, Relational, Similarity, TextDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory is assembled from per-area registries; each entry
  * is a `Q` carrying the Spark implementation and (when SQL-expressible) a
  * DuckDB oracle with identical column names and ORDER BY.
  */
object SparkEntry {

  /** Full registry: reference-parity ops (Relational), analytics extensions
    * (Analytics/Events), and the LLM-pipeline operators
    * (TextDedup/Similarity/Multimodal).
    */
  val registry: Seq[Q] =
    Relational.defs ++ Analytics.defs ++ Events.defs ++
      TextDedup.defs ++ FullText.defs ++ Similarity.defs ++ Multimodal.defs ++ Advanced.defs ++
      AqlQueries.defs ++ graft.sources.CorpusFormats.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.2's minimum slice through the FULL stack: AQL text →
    * lexer → parser → lowering → catalog → pushed-filter parquet scan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("aql_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap

  /** Headline subset used by Bench (scan, agg, joins, dedup, ANN). */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)
}
