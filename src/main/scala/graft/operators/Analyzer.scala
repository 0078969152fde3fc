package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE text tokenization, in one place (round 15). Every text consumer —
  * the full-text postings ([[FullText.postingsOf]]), MATCH PHRASE
  * positions, document lengths, and (by explicit knob) nothing else yet —
  * draws its token stream from here, in three synchronized spellings:
  * the Spark column expression, the driver-side literal-term twin (MATCH
  * query terms must analyze EXACTLY like the postings they probe), and
  * the DuckDB oracle expression.
  *
  * Two analyzers:
  *  - `whitespace` (the default, preserving the engine's historical
  *    behavior and every committed text index part): lowercase, split on
  *    single spaces, drop empty tokens. `"word."` stays `"word."`.
  *  - `standard`: lowercase, then every maximal run of Unicode letters /
  *    digits is a token (`[\p{L}\p{N}]+` — the Lucene StandardAnalyzer
  *    posture, minus stemming/stop words). `"Word,"` becomes `"word"`,
  *    punctuation mints no junk terms — what real (non-fixture) text
  *    needs for `MATCH` to behave like retrieval.
  *
  * The class is CONTENT-DEFINING for a text index: an index's analyzer
  * is frozen in its metadata at CREATE (like ivf centroids), postings
  * derive with it at every commit, and lookups analyze their query
  * terms with it — changing it is a different index (recreate), never a
  * silent drift. The reference has no text search at all (its only
  * string ops are contains/regex, `/root/reference/src/
  * query_conditions.rs:422-479`), so the analyzer contract is ours to
  * define; `standard` follows Lucene's public default.
  *
  * Pattern parity: Spark compiles the pattern with java.util.regex, the
  * driver twin uses the same class, and DuckDB's RE2 supports the same
  * `\p{L}`/`\p{N}` Unicode categories — one pattern string, three
  * engines, same tokens.
  */
object Analyzer {
  val Whitespace = "whitespace"
  val Standard = "standard"
  val Names: Seq[String] = Seq(Whitespace, Standard)

  private val StdPattern = "[\\p{L}\\p{N}]+"

  /** Canonicalize + validate an analyzer name (DDL surface). */
  def requireValid(a: String): String = {
    val x = a.toLowerCase
    require(Names.contains(x),
      s"unknown analyzer '$a' (analyzers: ${Names.mkString(", ")})")
    x
  }

  /** The token ARRAY of a text column — empty-filtered, lowercased;
    * codegen'd built-ins only (split/filter or regexp_extract_all). */
  def tokens(text: Column, analyzer: String = Whitespace): Column =
    analyzer match {
      case Whitespace => filter(split(lower(text), " "), t => t =!= "")
      case Standard =>
        regexp_extract_all(lower(text), lit(StdPattern), lit(0))
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer '$other'")
    }

  /** Driver-side twin for LITERAL query terms — MUST tokenize exactly
    * like [[tokens]] (same lowercase, same pattern class), so a MATCH
    * term probes the same postings the index stored. */
  def tokensOf(s: String, analyzer: String = Whitespace): Seq[String] =
    analyzer match {
      case Whitespace =>
        s.toLowerCase.split(" ").toIndexedSeq.filter(_.nonEmpty)
      case Standard =>
        val m = java.util.regex.Pattern.compile(StdPattern)
          .matcher(s.toLowerCase)
        val b = IndexedSeq.newBuilder[String]
        while (m.find()) b += m.group()
        b.result()
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer '$other'")
    }

  /** The DuckDB expression producing the same token list from a text
    * expression — the oracle-side spelling of [[tokens]]. */
  def duckTokens(textExpr: String, analyzer: String = Whitespace): String =
    analyzer match {
      case Whitespace =>
        s"list_filter(string_split(lower($textExpr), ' '), t -> t <> '')"
      case Standard =>
        s"regexp_extract_all(lower($textExpr), '$StdPattern')"
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer '$other'")
    }
}
