package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Line-oriented interchange formats for the document corpus.
  *
  * The reference externalizes long Text values into side text files next
  * to the fixed-width container (`/root/reference/src/container.rs`,
  * `src/database.rs` MAX_STR_LEN=128); the Spark-first generalization is a
  * real source/sink pair for the corpus in the formats training data
  * actually arrives in — JSONL (the de-facto corpus wire format), CSV, and
  * ORC (the other splittable columnar warehouse format).
  *
  * Scale rules encoded here:
  *  - EXPLICIT schema-on-read, never inference: at 100 TB schema inference
  *    is a full extra pass over every file before the first real scan.
  *  - Line-oriented files (no multiLine), so Spark can split a large file
  *    at arbitrary byte offsets and parallelize the scan per 128 MB block;
  *    a multi-line CSV is unsplittable and serializes on one core.
  *  - The staged copy is written once per fixture (keyed by source file
  *    identity, tmp-dir + rename-into-place like Tables.compacted) — the
  *    round-trip queries then prove content equality against the parquet
  *    originals via the DuckDB oracle, which only ever sees parquet.
  */
object CorpusFormats {
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def staged(s: SparkSession, dir: String, fmt: String): String = {
    val src = new java.io.File(s"$dir/documents.parquet")
    // discriminator "v2": the newline guard below must also apply to
    // corpora CSV-staged before the guard existed — bumping the cache key
    // invalidates any pre-guard staging
    Tables.buildOnce(src, "graft-formats", s"documents-$fmt", s"$fmt-v2") { tmp =>
      val docs = Tables.load(s, dir, "documents")
      fmt match {
        case "json" => docs.write.mode("overwrite").json(tmp.getPath)
        // columnar interchange: ORC is the other splittable columnar
        // format warehouses exchange; stripes parallelize like row groups
        case "orc" => docs.write.mode("overwrite").orc(tmp.getPath)
        case "csv" =>
          // A splittable CSV cannot hold embedded newlines IN ANY string
          // column: the writer would quote them, but the line-splitting
          // reader (no multiLine — multiLine serializes each file onto
          // one core) would shear the record. JSONL escapes newlines and
          // is the right format for such corpora; here we refuse loudly
          // instead of corrupting silently.
          val nl = Seq("text", "lang", "source")
            .map(c => col(c).rlike("[\\n\\r]")).reduce(_ || _)
          val bad = docs.filter(nl).count()
          require(bad == 0L,
            s"$bad document(s) contain newlines in a string column; CSV " +
              "staging would corrupt them — use the JSONL source for this corpus")
          docs.write.mode("overwrite").option("header", "true")
            .option("quoteAll", "true").option("escape", "\"").csv(tmp.getPath)
      }
    }
  }

  def readJsonl(s: SparkSession, dir: String): DataFrame =
    s.read.schema(docSchema).json(staged(s, dir, "json"))

  /** A corpus whose files span a SCHEMA CHANGE: even-doc_id rows are
    * staged WITHOUT the `lang` column (the "old writer" files), odd rows
    * with it — the normal state of a long-lived 100 TB lake where a column
    * was added mid-history. Reading with the full explicit schema fills
    * the missing column with NULL for old files (parquet column-by-name
    * resolution; no rewrite of old data, no schema inference pass).
    */
  def readEvolved(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val root = Tables.buildOnce(src, "graft-formats", "documents-evolved", "v1") { tmp =>
      val docs = Tables.load(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0).drop("lang")
        .write.mode("overwrite").parquet(new java.io.File(tmp, "old").getPath)
      docs.filter(col("doc_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(new java.io.File(tmp, "new").getPath)
    }
    s.read.schema(docSchema).parquet(s"$root/old", s"$root/new")
  }

  def readCsv(s: SparkSession, dir: String): DataFrame =
    s.read.schema(docSchema).option("header", "true").option("escape", "\"")
      .csv(staged(s, dir, "csv"))

  def readOrc(s: SparkSession, dir: String): DataFrame =
    s.read.schema(docSchema).orc(staged(s, dir, "orc"))

  /** Per-source content summary: counts + byte totals + an md5 content
    * range. Equality with the parquet-backed oracle proves the round-trip
    * lost nothing (ids, text bytes, metadata).
    */
  private def summarize(df: DataFrame): DataFrame =
    df.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars")).as("sum_chars"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      min(md5(col("text"))).as("min_h"),
      max(md5(col("text"))).as("max_h"))
      .orderBy(col("source"))

  private val oracleSummary =
    """SELECT source, count(*) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       count(DISTINCT md5(text)) AS n_distinct,
      |       min(md5(text)) AS min_h, max(md5(text)) AS max_h
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("src_jsonl_roundtrip", oracleSummary) {
      (s, dir) => summarize(readJsonl(s, dir))
    },
    Q("src_csv_roundtrip", oracleSummary) {
      (s, dir) => summarize(readCsv(s, dir))
    },
    // the oracle only ever sees parquet — equality proves the ORC staging
    // and vectorized ORC read lost nothing
    Q("src_orc_roundtrip", oracleSummary) {
      (s, dir) => summarize(readOrc(s, dir))
    },
    // schema evolution: old-writer files lack `lang`; the explicit-schema
    // read nulls it there. The oracle reconstructs the same view from the
    // unsplit fixture, proving nothing else changed.
    Q("src_schema_evolution",
      """SELECT source,
        |       count(*) AS n,
        |       count(CASE WHEN doc_id % 2 <> 0 THEN lang END) AS n_lang,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        readEvolved(s, dir).groupBy(col("source")).agg(
          count(lit(1)).as("n"),
          count(col("lang")).as("n_lang"),
          sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"))
    })
}
