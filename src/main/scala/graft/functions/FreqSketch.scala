package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items sketch (Anderson, Bevan, Lang, Liberty, Rhodes &
  * Thaler, "A high-performance algorithm for identifying frequent items
  * in data streams", IMC 2017 — the generalized Misra-Gries family) over
  * a string-or-integral column, via the Apache DataSketches library
  * already on Spark's classpath. The third member of the engine's
  * approx-aggregate family: HLL answers "how many distinct", KLL "what
  * value at rank q", this one "WHICH values dominate, with counts".
  *
  *   freq_sketch_agg(col[, maxMapSize]) → BINARY  mergeable sketch
  *   freq_merge(a, b)                   → BINARY  union of two sketches
  *   freq_top_k(sk, k)                  → ARRAY<STRUCT<item,n>> top-k by count
  *
  * Spark-first shape like the KLL/theta siblings: a
  * [[TypedImperativeAggregate]] whose buffer is the live ItemsSketch
  * (per-row updates, zero serialization); partials are bounded by the map
  * size — ≤ maxMapSize counters regardless of input rows — so a 100 TB
  * group-by ships per-partition counter maps, never values. The sketch is
  * EXACT while a group's distinct values fit the map (≤ 0.75 × maxMapSize
  * active items never purge, `getMaximumError == 0`); past that it keeps
  * Misra-Gries guarantees: estimates within n/maxMapSize of truth, no
  * false negatives above the error bound (FreqSketchSpec pins both
  * regimes). Items are canonicalized to STRING at update (the AQL surface
  * renders results textually; integral callers keep ordering by count,
  * not numeric value).
  *
  * `freq_top_k` orders (count DESC, item ASC) — the deterministic
  * tie-break both the DuckDB oracle and the incremental-view fold
  * reproduce — and returns AT MOST k rows: in the estimation regime the
  * sketch only surfaces items above its error threshold (the honest
  * answer; a below-threshold item's rank is unknowable from the sketch).
  *
  * Registered through [[GraftExtensions]] like the other native functions.
  */
object FreqSketch {
  /** 256 counters ≈ 5 KB partials; exact for groups up to ~192 distinct
    * values — sized for "top values of a categorical column", the query
    * this aggregate exists for. */
  val DefaultMaxMapSize: Int = 256

  private[functions] val serde = new ArrayOfStringsSerDe

  /** Column-level entry points (resolve through the session registry). */
  def freqAgg(c: Column): Column = call_function("freq_sketch_agg", c)
  def freqMerge(a: Column, b: Column): Column = call_function("freq_merge", a, b)
  def freqTopK(sk: Column, k: Int): Column =
    call_function("freq_top_k", sk, org.apache.spark.sql.functions.lit(k))

  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  /** The TEXT rendering of a sketch's top-k — `item:count,item:count` in
    * (count DESC, item ASC) order. This is the form the AQL surface and
    * the incremental view's visible column both emit (the MV stores it in
    * a TEXT column; a SEARCH over the source computes the identical
    * string, so view and query agree), and the form the DuckDB oracle
    * reproduces with string_agg over a ranked window. NULL sketch → NULL
    * (all-NULL group), like approx_median. */
  def renderTopK(sk: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{array_join, concat, lit, transform}
    array_join(transform(freqTopK(sk, k),
      x => concat(x.getField("item"), lit(":"), x.getField("n").cast(StringType))),
      ",")
  }

  val topKType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
}

/** `freq_sketch_agg(col[, maxMapSize])` — the mergeable frequent-items
  * sketch of a string or integral column (canonicalized to string).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def prettyName: String = "freq_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "freq_sketch_agg expects a string or integral column, " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buffer.update(s.toString)
      case v => buffer.update(v.toString)
    }
    buffer
  }

  override def merge(
      a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }

  /** An empty group (all inputs NULL) yields NULL, like min/max. */
  override def eval(buffer: ItemsSketch[String]): Any =
    if (buffer.isEmpty) null else buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `freq_merge(a, b)` — union of two serialized sketches. NULL-tolerant
  * on either side (a NULL sketch is the empty stream), matching
  * `kll_merge`/`theta_union` so fold code needs no case analysis.
  */
case class FreqMergeExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "freq_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find(t => t != BinaryType && t != NullType)
      .map(t => TypeCheckResult.TypeCheckFailure(
        s"freq_merge expects binary sketches, got ${t.catalogString}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def eval(input: InternalRow): Any = {
    (left.eval(input), right.eval(input)) match {
      case (null, null) => null
      case (a, null) => a
      case (null, b) => b
      case (a: Array[Byte], b: Array[Byte]) =>
        FreqSketch.heapify(a).merge(FreqSketch.heapify(b))
          .toByteArray(FreqSketch.serde)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** `freq_top_k(sk, k)` — the top-k items by estimated count, ordered
  * (count DESC, item ASC), as `ARRAY<STRUCT<item STRING, n BIGINT>>`.
  * NULL sketch → NULL. In the estimation regime only items the sketch
  * can bound (NO_FALSE_NEGATIVES) are candidates, so fewer than k rows
  * may return.
  */
case class FreqTopKExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "freq_top_k"
  override def dataType: DataType = FreqSketch.topKType
  override def nullable: Boolean = true

  // k accepts ANY foldable integral width (kll_quantile's lenient
  // stance): a ByteType/ShortType literal is a reasonable call
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
        right.foldable && Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "freq_top_k expects (binary sketch, foldable integer k)")

  // NULL k propagates NULL (kll_quantile's convention)
  private lazy val k: Option[Int] = right.eval(InternalRow.empty) match {
    case null => None
    case n: java.lang.Number =>
      val i = n.longValue()
      require(i >= 1, s"freq_top_k k=$i must be >= 1")
      Some(math.min(i, Int.MaxValue).toInt)
  }

  override def eval(input: InternalRow): Any =
    if (k.isEmpty) null
    else left.eval(input) match {
      case null => null
      case bytes: Array[Byte] =>
        val rows = FreqSketch.heapify(bytes)
          .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        // tie-break in UTF-8 BYTE order (Spark/DuckDB string order), not
        // JVM UTF-16 code-unit order — they diverge on supplementary-
        // plane characters and the oracle compares against DuckDB's sort
        val top = rows.map(r =>
            (UTF8String.fromString(r.getItem), r.getEstimate))
          .sortWith { case ((ia, na), (ib, nb)) =>
            if (na != nb) na > nb else ia.compareTo(ib) < 0 }
          .take(k.get)
        new GenericArrayData(top.map { case (item, n) => InternalRow(item, n) })
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopKExpr =
    copy(left = newLeft, right = newRight)
}
