package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, StandardCopyOption}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** ANALYZE CONTAINER — per-column statistics of the committed data
  * (`ANALYZE CONTAINER c` / `SHOW STATS c`), the standard warehouse
  * observability surface (ANALYZE/SHOW STATS in DuckDB and Trino,
  * ANALYZE TABLE … COMPUTE STATISTICS in Spark; the reference exposes no
  * stats surface — its chunk index carries only first-column min/max,
  * `/root/reference/src/indexing.rs`).
  *
  * One distributed aggregation pass computes every column's row/null/
  * distinct counts, min/max (rendered as strings so one relation carries
  * all types) and average length for TEXT columns — the multi-distinct
  * expand plan, a single job over one scan, no per-column passes. The
  * bounded result (one row per schema column) persists in the catalog
  * (`<name>.stats`, atomic swap) pinned to the version it analyzed, so
  * SHOW STATS is a metadata read and staleness is visible as
  * `version < currentVersion`.
  *
  * Scale note: distinct counts are EXACT (count(distinct) — one shuffle
  * through the expand plan, and oracle-comparable against DuckDB); at
  * warehouse scale the same surface would flip to approx_count_distinct
  * per column behind a settings knob without changing the statement.
  */
object Stats {

  /** Stats relation: leading ordinal makes the cursor's all-columns
    * ascending order the schema order. */
  private val schema = StructType(Seq(
    StructField("ordinal", IntegerType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("col_type", StringType, nullable = false),
    StructField("analyzed_version", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true),
    StructField("avg_len", DoubleType, nullable = true)))

  private def statsFile(cat: Catalog, name: String) = cat.statsFile(name)

  /** Compute, persist (atomic swap), and return the stats relation.
    * `distinctMode` = `exact` (multi-distinct expand plan, the
    * oracle-comparable default) or `approx` (HyperLogLog++ per column —
    * one pass without the expand, the `stats_distinct` warehouse
    * setting). */
  def analyze(cat: Catalog, name: String,
      distinctMode: String = "exact"): DataFrame = {
    val d = cat.get(name)
    val v = cat.currentVersion(name)
    // read THE version being pinned — a commit racing between the
    // pointer read and a pointer-resolving read() would persist v+1's
    // numbers labeled as v's
    val df = if (v > 0) cat.readVersion(name, v) else cat.read(name)
    // avg content length is measured for STRING and BINARY columns alike
    // (length() is byte length on binary) — the broadcast cost model
    // needs a real width for both, never a guessed floor
    val isText = d.columns.map { case (n, t) =>
      n -> (t.spark == StringType || t.spark == BinaryType) }.toMap
    def ndv(c: org.apache.spark.sql.Column) =
      if (distinctMode == "approx") approx_count_distinct(c) else countDistinct(c)
    val aggs = d.columns.flatMap { case (n, _) =>
      val c = col(n)
      Seq(
        count(c).as(s"c_$n"),
        ndv(c).as(s"d_$n"),
        min(c).cast("string").as(s"mn_$n"),
        max(c).cast("string").as(s"mx_$n")) ++
        (if (isText(n)) Seq(avg(length(c)).as(s"l_$n")) else Nil)
    } :+ count(lit(1)).as("n_rows")
    // ONE aggregated row — bounded driver-side metadata, like an index's
    // probe-key list, never data
    val agg = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def get[A](field: String): Option[A] = {
      val i = agg.fieldIndex(field)
      if (agg.isNullAt(i)) None else Some(agg.get(i).asInstanceOf[A])
    }
    // the v>0 branch read a pinned immutable version; the v==0 branch's
    // read() resolved the pointer itself, so a racing FIRST commit could
    // have slid v1's rows under the v0 label — recompute on the settled
    // pointer (terminates: the retry takes the pinned branch)
    if (v == 0 && cat.currentVersion(name) != 0)
      return analyze(cat, name, distinctMode)
    val nRows = get[Long]("n_rows").getOrElse(0L)
    val rows = d.columns.zipWithIndex.map { case ((n, t), i) =>
      Row(i + 1, n, t.name, v, nRows,
        nRows - get[Long](s"c_$n").getOrElse(0L),
        get[Long](s"d_$n").getOrElse(0L),
        get[String](s"mn_$n").orNull,
        get[String](s"mx_$n").orNull,
        if (isText(n)) get[java.lang.Double](s"l_$n").orNull else null)
    }
    persist(cat, name, rows)
    relation(cat, rows)
  }

  /** Average rows-per-value of `column` from the persisted stats (None
    * if never analyzed or the column is unknown to them). The classic
    * cost-model input (n_rows / n_distinct) for access-path choice: the
    * engine skips a value-index probe whose average group already
    * exceeds the probe cap. A stale estimate can only cost the probe or
    * the prune, never correctness — both paths return the same rows.
    */
  def avgGroupSize(cat: Catalog, name: String, column: String): Option[Double] =
    try {
      val f = statsFile(cat, name)
      if (!Files.exists(f)) None
      else Files.readAllLines(f, StandardCharsets.UTF_8)
        .toArray(Array.empty[String]).toSeq
        .map(_.split("\t", -1))
        .find(p => p.length > 6 && p(1).equalsIgnoreCase(column))
        .flatMap { p =>
          val ndv = p(6).toLong
          if (ndv > 0) Some(p(4).toLong.toDouble / ndv) else None
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Analyzed row count from the persisted stats (None if never
    * analyzed) — the N that turns per-column [[avgGroupSize]] estimates
    * into a composite-key selectivity (N / Π ndv_i). */
  def rowCount(cat: Catalog, name: String): Option[Long] =
    try {
      val f = statsFile(cat, name)
      if (!Files.exists(f)) None
      else Files.readAllLines(f, StandardCharsets.UTF_8)
        .toArray(Array.empty[String]).toSeq.find(_.nonEmpty)
        .map(_.split("\t", -1)(4).toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Estimated in-memory bytes of `columns` of the container, from the
    * persisted stats: `n_rows × Σ per-column width`, where TEXT-family
    * widths use the MEASURED avg_len and fixed-width types their storage
    * size. None if never analyzed or any requested column is unknown to
    * the stats (they predate an ALTER — the writer invalidates on ALTER,
    * but a racing reader stays safe).
    *
    * This is the broadcast-side cost input (`Engine.joinedSource`): unlike
    * a file-size estimate it prices exactly the columns the plan will
    * carry — a dimension with one fat unreferenced TEXT column still
    * broadcasts its two joined columns. A stale estimate can only cost
    * plan quality, never correctness (both join strategies return the
    * same rows).
    */
  def estimatedBytes(cat: Catalog, name: String,
      columns: Seq[String]): Option[Long] =
    try {
      val f = statsFile(cat, name)
      if (!Files.exists(f)) return None
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8)
        .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
        .map(_.split("\t", -1))
      val byCol = lines.map(p => p(1).toLowerCase -> p).toMap
      val nRows = lines.headOption.map(_(4).toLong).getOrElse(return None)
      val widths = columns.distinct.map { c =>
        val p = byCol.getOrElse(c.toLowerCase, return None)
        val avgLen = if (p(9) == "-") None else Some(p(9).toDouble)
        p(2) match {
          case "BOOL" => 1.0
          case "INT" => 4.0
          case "BIGINT" | "FLOAT" => 8.0
          // BYTES columns without a measured width (all-NULL, or a stats
          // file written before binary lengths were measured) are
          // UNPRICEABLE — a guessed floor here would under-price a fat
          // embedding column straight into a pinned-broadcast OOM
          case t if t.endsWith("-BYTES") && avgLen.isEmpty => return None
          // TEXT family (TEXT/CHAR/…STRING/NONE) and measured bytes:
          // average content length plus per-value overhead
          case _ => avgLen.getOrElse(0.0) + 16.0
        }
      }
      Some((nRows * widths.sum).toLong)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The version the persisted stats describe (None if never analyzed). */
  def analyzedVersion(cat: Catalog, name: String): Option[Int] =
    try {
      val f = statsFile(cat, name)
      if (!Files.exists(f)) None
      else Files.readAllLines(f, StandardCharsets.UTF_8)
        .toArray(Array.empty[String]).toSeq.find(_.nonEmpty)
        .map(_.split("\t", -1)(3).toInt)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The persisted stats, or None if the container was never analyzed. */
  def readStats(cat: Catalog, name: String): Option[DataFrame] = {
    val f = statsFile(cat, name)
    if (!Files.exists(f)) return None
    val rows = Files.readAllLines(f, StandardCharsets.UTF_8)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { line =>
        val p = line.split("\t", -1)
        Row(p(0).toInt, p(1), p(2), p(3).toInt, p(4).toLong, p(5).toLong,
          p(6).toLong, unb64(p(7)).orNull, unb64(p(8)).orNull,
          if (p(9) == "-") null else p(9).toDouble)
      }
    Some(relation(cat, rows))
  }

  private def relation(cat: Catalog, rows: Seq[Row]): DataFrame =
    cat.spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  // min/max render as strings that may contain tabs/newlines (TEXT
  // columns) — base64 keeps the TSV line-oriented; "-" marks NULL (it is
  // not in the base64 alphabet)
  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): Option[String] =
    if (s == "-") None
    else Some(new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8))

  private def persist(cat: Catalog, name: String, rows: Seq[Row]): Unit = {
    val body = rows.map { r =>
      Seq(r.getInt(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        Option(r.getString(7)).map(b64).getOrElse("-"),
        Option(r.getString(8)).map(b64).getOrElse("-"),
        if (r.isNullAt(9)) "-" else r.getDouble(9).toString).mkString("\t")
    }.mkString("\n")
    val tmp = cat.catalogDir.resolve(
      s"$name.stats.tmp-${ProcessHandle.current.pid}-${System.nanoTime()}")
    try {
      Files.writeString(tmp, body)
      Files.move(tmp, statsFile(cat, name), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case t: Throwable =>
        try Files.deleteIfExists(tmp)
        catch { case scala.util.control.NonFatal(c) => t.addSuppressed(c) }
        throw t
    }
  }
}
