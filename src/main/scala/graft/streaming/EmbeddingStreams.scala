package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the `embeddings` table — streaming inference
  * for the vector operators in `graft.operators.Similarity`.
  */
object EmbeddingStreams {

  /** File-source stream over the fixture embeddings parquet. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    StreamStaging.readFileStream(spark, s"$dir/embeddings.parquet")

  /** Streaming twin of `km_lloyd_assign`'s assignment half: score each
    * incoming vector against a FIXED centroid set — the routing /
    * drift-monitoring step of a deployed k-means (IVF) index. The batch
    * path's row_number window cannot run on a stream, so the argmin is a
    * single stateless projection instead: per row, an array of
    * (d2, sid) structs — one per centroid — reduced with array_min, whose
    * struct ordering (d2 first, sid second) reproduces the batch
    * tie-break exactly. ZERO state, no shuffle; centroids ride along as
    * literals (k rows by construction, same reasoning as the batch
    * broadcast). Distances use the same round-6 element-order double
    * summation as the batch plan, so assignments agree bit-for-bit
    * (StreamingSpec pins equality against km_lloyd_assign).
    */
  def assignToCentroids(vecs: DataFrame,
      centroids: Seq[(Long, Array[Float])]): DataFrame = {
    require(centroids.nonEmpty, "centroid set must not be empty")
    val cands = centroids.map { case (sid, emb) =>
      struct(
        round(graft.operators.Similarity.d2(col("embedding"), lit(emb)), 6).as("d2"),
        lit(sid).as("sid"))
    }
    vecs.select(col("vec_id"), array_min(array(cands: _*)).as("best"))
      .select(col("vec_id"), col("best.sid").as("cluster"), col("best.d2").as("d2"))
  }
}
