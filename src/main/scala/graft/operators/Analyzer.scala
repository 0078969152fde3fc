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
  * Three analyzers:
  *  - `whitespace` (the default): lowercase, split on single spaces,
  *    drop empty tokens. `"word."` stays `"word."`. NOTE the empty-token
  *    filter landed in round 15 and is itself CONTENT-DEFINING for band
  *    derivations — band indexes carry a tokenization format version
  *    (`Index.Def.tokv`) and parts built before the filter are refused
  *    with a REBUILD pointer, never silently probed.
  *  - `standard`: lowercase, then every maximal run of Unicode letters /
  *    digits is a token (`[\p{L}\p{N}]+` — the Lucene StandardAnalyzer
  *    posture, minus stemming/stop words). `"Word,"` becomes `"word"`,
  *    punctuation mints no junk terms — what real (non-fixture) text
  *    needs for `MATCH` to behave like retrieval.
  *  - `english` (round 16): `standard` tokenization, then the fixed
  *    33-word Lucene-default English stop set is removed, then each
  *    surviving token Porter-stems ([[Porter]]) — `running`/`runs`/
  *    `run` collapse to one term and stop words stop dominating BM25
  *    document length, the Lucene EnglishAnalyzer retrieval posture.
  *
  * The class is CONTENT-DEFINING for a text index: an index's analyzer
  * is frozen in its metadata at CREATE (like ivf centroids), postings
  * derive with it at every commit, and lookups analyze their query
  * terms with it — changing it is a different index (recreate), never a
  * silent drift. The reference has no text search at all (its only
  * string ops are contains/regex, `/root/reference/src/
  * query_conditions.rs:422-479`), so the analyzer contract is ours to
  * define; `standard`/`english` follow Lucene's public defaults.
  *
  * Pattern parity: Spark compiles the pattern with java.util.regex, the
  * driver twin uses the same class, and DuckDB's RE2 supports the same
  * `\p{L}`/`\p{N}` Unicode categories — one pattern string, three
  * engines, same tokens. The `english` stemmer exists in TWO spellings
  * only (the native Spark expression and the driver twin both call the
  * ONE [[Porter.stem]] function — parity is by construction); DuckDB
  * cannot stem, so its `english` spelling stops at the stop-word
  * sublayer — see [[duckTokens]] for the validity contract.
  */
object Analyzer {
  val Whitespace = "whitespace"
  val Standard = "standard"
  val English = "english"
  val Names: Seq[String] = Seq(Whitespace, Standard, English)

  /** The Lucene-default English stop set (33 words — the public
    * `EnglishAnalyzer.ENGLISH_STOP_WORDS_SET` list), removed AFTER
    * standard tokenization and BEFORE stemming. Fixed forever: like the
    * tokenizer pattern it is content-defining index state, so it is a
    * constant, not a knob. */
  val StopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")
  private val StopSet = StopWords.toSet

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
      case English =>
        // standard tokens → stop filter → Porter stem, all inside one
        // codegen'd projection (the stem is a native expression —
        // graft.functions.PorterStem — so the whole chain stays in
        // whole-stage codegen; requires a GraftExtensions session)
        transform(
          filter(regexp_extract_all(lower(text), lit(StdPattern), lit(0)),
            t => !t.isInCollection(StopWords)),
          t => graft.functions.PorterStem.porterStem(t))
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
      case English =>
        // the SAME Porter.stem the Spark expression calls — parity by
        // construction, pinned by the AnalyzerPropertySpec fuzz
        tokensOf(s, Standard).filterNot(StopSet.contains).map(Porter.stem)
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
      case English =>
        // THE STOP-WORD SUBLAYER ONLY — DuckDB cannot Porter-stem, so
        // this spelling emits the stop-filtered standard stream WITHOUT
        // the stemming stage. It is a valid oracle recompute exactly
        // when the query is STEM-NEUTRAL: every probed term is a Porter
        // fixed point (stem(t) == t) and no other corpus token stems
        // INTO a probed term — then the probed terms' postings (tf, df)
        // and every document length (stemming is 1:1 on tokens, so dl /
        // avgdl / N are sublayer-invariant) agree between the two
        // streams, and BM25 over the probed terms is identical. Oracle
        // rows built on this spelling must pin stem-neutral terms (the
        // aql_match_analyzer_en fixture does, over the closed fixture
        // vocabulary); the stemming stage itself is verified by the
        // driver-twin parity fuzz plus the published-vocabulary pins
        // (PorterStemSpec) and a rank pin where stemming changes the
        // top-k (FullTextIndexSpec).
        s"list_filter(${duckTokens(textExpr, Standard)}, " +
          s"t -> t NOT IN (${StopWords.map(w => s"'$w'").mkString(", ")}))"
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer '$other'")
    }
}
