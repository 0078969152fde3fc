package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the `documents` table — the streaming side of
  * the dedup operators in `graft.operators.TextDedup` (north-star
  * extension; SURVEY.md §2.4). The batch results are DuckDB-verified, so
  * each streaming pipeline is checked against its batch twin in
  * StreamingSpec.
  *
  * Scale design: exact dedup state is one entry per DISTINCT content hash
  * (not per document), hash-partitioned across the cluster by the same key
  * the batch groupBy shuffles on. A corpus with d% duplicates keeps
  * state ≤ (1-d%) of corpus cardinality — the standard streaming-ingest
  * dedup layout for an append-only document lake.
  */
object DocumentStreams {

  /** File-source stream over the fixture documents parquet. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    StreamStaging.readFileStream(spark, s"$dir/documents.parquet")

  /** Streaming twin of `dd_exact`: per content-hash count + keeper id as a
    * stateful aggregation (complete/update mode). Deterministic — the
    * min(doc_id) keeper does not depend on arrival order.
    */
  def exactDedupCounts(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))

  /** First-seen streaming dedup: emit each document whose content hash has
    * not been seen before (append mode). State is one entry per distinct
    * hash; with an event-time column, `dropDuplicatesWithinWatermark`
    * bounds it to the dedup horizon — the fixture documents carry no
    * timestamp, so the unbounded exact variant is the honest twin here.
    */
  def firstSeen(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .dropDuplicates("h")

  /** Streaming twin of `t_heavy_hitters`: the Misra-Gries summary as a
    * stateful streaming aggregation (complete mode). State is ONE summary
    * of ≤ k counters — constant-size regardless of how many documents have
    * streamed through, which is the whole point of a mergeable sketch on an
    * unbounded stream (an exact streaming token count would grow state per
    * distinct token forever). The n/(k+1) bounds hold against the exact
    * counts of everything ingested so far (StreamingSpec pins it).
    */
  def heavyHitters(docs: DataFrame, k: Int = 256): DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    docs.select(explode(split(lower(col("text")), " ")).as("tok"))
      .agg(mg(col("tok")).as("mg"))
      .select(explode(col("mg")).as(Seq("token", "approx_count")))
  }

  /** Streaming twin of `t_pii_scrub`: the compliance pass applied AT
    * INGEST (append mode, stateless projection — redact before anything
    * is persisted downstream, the shape a real pipeline wants). Exactly
    * the batch operator's projection, so StreamingSpec pins equivalence.
    */
  def piiScrubbed(docs: DataFrame): DataFrame =
    graft.operators.TextDedup.piiScrub(docs)

  /** Streaming twin of `t_decontaminate`'s hit detection: the incoming
    * documents' 4-grams stream-static joined against the (static,
    * broadcast) benchmark gram set. Emits one (doc_id, g) row per hit in
    * append mode with ZERO state — a stateless stream-static join is the
    * honest 100 TB shape for ingest-time contamination tagging, since the
    * eval-suite side is a few MB and never changes mid-run. Per-doc
    * distinct counting is downstream batch work (or a watermarked
    * stateful agg once documents carry event time).
    */
  def contaminationHits(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    graft.operators.TextDedup.grams4(docs)
      .join(broadcast(benchGrams), Seq("g"))
      .select(col("doc_id"), col("g"))
}
