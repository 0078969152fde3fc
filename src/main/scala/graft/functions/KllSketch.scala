package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin, Lang & Liberty 2016, "Optimal quantile
  * approximation in streams", FOCS) over a numeric column, via the
  * Apache DataSketches library already on Spark's classpath (the same
  * library backing Spark's own `hll_sketch_agg`). Three functions,
  * mirroring the HLL trio the approx_distinct machinery uses:
  *
  *   kll_sketch_agg(col[, k]) → BINARY   mergeable sketch of the group
  *   kll_merge(a, b)          → BINARY   union of two sketches
  *   kll_quantile(sk, q)      → DOUBLE   rank-q order statistic estimate
  *
  * Spark-first shape: the aggregate is a [[TypedImperativeAggregate]] —
  * the live sketch object is the aggregation buffer (updated per row with
  * ZERO serialization), and bytes cross the wire only at partial-merge
  * boundaries, exactly like Spark's DataSketches HLL implementation. Each
  * partial is ≤ a few KB regardless of row count, so a 100 TB scan ships
  * per-partition sketches, never values. Normalized rank error at the
  * default k=200 is ~1.65% (99% conf.); for n ≤ k the sketch retains
  * every value, so small groups are EXACT (KllSketchSpec pins both).
  *
  * The estimate is an ORDER STATISTIC (a retained value, inclusive search
  * criterion) — the engine's `approx_median` therefore answers with an
  * actual data value, not an interpolation (DuckDB's `median` over an
  * even-sized numeric group interpolates; oracle rows tolerance-check by
  * rank instead of comparing definitions).
  *
  * Registered through [[GraftExtensions]] like the other native functions.
  */
object KllSketch {
  val DefaultK: Int = 200

  /** Column-level entry points (resolve through the session registry). */
  def kllAgg(c: Column): Column = call_function("kll_sketch_agg", c)
  def kllMerge(a: Column, b: Column): Column = call_function("kll_merge", a, b)
  def kllQuantile(sk: Column, q: Double): Column =
    call_function("kll_quantile", sk, org.apache.spark.sql.functions.lit(q))

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `kll_sketch_agg(col)` — the mergeable KLL sketch of a numeric column. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects a numeric column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalStateException(
        s"kll_sketch_agg: unexpected input ${other.getClass.getName}")
    })
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  /** An empty group (all inputs NULL) yields NULL, like min/max — the
    * caller's NULL handling then matches plain-aggregate semantics. */
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge(a, b)` — union of two serialized sketches. NULL-tolerant on
  * either side (a NULL sketch is the empty set), so fold code can merge a
  * possibly-absent current sketch with a possibly-absent delta without
  * case analysis. Per-GROUP work on KB-sized payloads — interpreted eval
  * (CodegenFallback) is the honest cost here, not a hot-path concern.
  */
case class KllMergeExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "kll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find(t => t != BinaryType && t != NullType)
      .map(t => TypeCheckResult.TypeCheckFailure(
        s"kll_merge expects binary sketches, got ${t.catalogString}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    (l, r) match {
      case (null, null) => null
      case (a, null) => a
      case (null, b) => b
      case (a: Array[Byte], b: Array[Byte]) =>
        val u = KllSketch.heapify(a)
        u.merge(KllSketch.heapify(b))
        u.toByteArray
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** `kll_quantile(sketch, q)` — the rank-q estimate (inclusive criterion,
  * an actual retained value). NULL sketch → NULL.
  */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // the rank accepts ANY foldable numeric, not DoubleType alone: a SQL
  // literal like 0.5 parses as DECIMAL(1,1), and rejecting it would make
  // `SELECT kll_quantile(sk, 0.5)` fail type check on a reasonable call
  // (the lenient stance the agg's k argument already takes)
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
        right.dataType.isInstanceOf[NumericType] && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_quantile expects (binary sketch, foldable numeric rank)")

  // a foldable NULL rank (e.g. CAST(NULL AS DOUBLE)) propagates NULL like
  // any SQL function — unboxing it to 0.0 would silently answer with the
  // sketch minimum
  private lazy val q: Option[Double] = right.eval(InternalRow.empty) match {
    case null => None
    case v =>
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case x: java.lang.Number => x.doubleValue()
      }
      require(d >= 0.0 && d <= 1.0, s"kll_quantile rank $d outside [0, 1]")
      Some(d)
  }

  override def eval(input: InternalRow): Any =
    if (q.isEmpty) null
    else left.eval(input) match {
      case null => null
      case bytes: Array[Byte] => KllSketch.heapify(bytes).getQuantile(q.get)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}
