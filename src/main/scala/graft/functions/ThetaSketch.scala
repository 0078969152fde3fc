package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch (Dasgupta, Lang, Rhodes & Thaler, "A Framework for
  * Estimating Stream Expression Cardinalities", ICDT 2016) — the
  * SET-OPERATION cardinality family HLL cannot provide: unlike HLL
  * (union-only), theta sketches close under union, INTERSECTION, and
  * DIFFERENCE, which is exactly what corpus-overlap measurement needs
  * ("how many distinct n-grams does the training corpus share with the
  * benchmark set" — pre-training decontamination triage at 100 TB where
  * an exact distinct-join would shuffle every gram). Via the Apache
  * DataSketches library already on Spark's classpath.
  *
  *   theta_sketch_agg(col[, lgK]) → BINARY  mergeable sketch of the group
  *   theta_union(a, b)            → BINARY  |A ∪ B| sketch
  *   theta_intersect(a, b)        → BINARY  |A ∩ B| sketch
  *   theta_diff(a, b)             → BINARY  |A \ B| sketch
  *   theta_estimate(sk)           → DOUBLE  distinct-count estimate
  *
  * Spark-first shape: the aggregate is a [[TypedImperativeAggregate]]
  * whose buffer is the live DataSketches `Union` gadget (per-row updates
  * with zero serialization); only compact-ordered sketch bytes — a few KB
  * at lgK=12 regardless of input size — cross partial-merge boundaries.
  * So measuring train∩benchmark overlap over a 100 TB corpus ships one
  * sketch per partition and the set algebra runs on the merged pair;
  * nothing data-sized moves. The sketch is EXACT (theta = 1.0, every hash
  * retained) until a group exceeds 2^lgK distinct values, then sampling
  * starts with rsd ≈ 1/sqrt(2^lgK) (~1.6% at the default lgK=12);
  * intersections inherit the min theta of their inputs
  * (ThetaSketchSpec pins the exact regime and the error band).
  *
  * Reference behavior context: the reference engine has no sketch
  * surface at all (`/root/reference/src/container.rs` stores rows only);
  * this extends the engine's approx_distinct (HLL) machinery to the set
  * ops the training-data pipeline needs. NULL handling follows the HLL
  * trio: NULL inputs are skipped, an all-NULL group yields a NULL sketch,
  * `theta_union` treats a NULL side as the empty set (fold-friendly),
  * while `theta_intersect`/`theta_diff`/`theta_estimate` propagate NULL
  * per SQL convention. Like Spark's own DataSketches HLL functions, an
  * EMPTY string/binary value is a library-level no-op (not retained).
  *
  * Registered through [[GraftExtensions]] like the other native functions.
  */
object ThetaSketch {
  /** 2^12 = 4096 nominal entries — DataSketches' own default. */
  val DefaultLgK: Int = 12

  /** Column-level entry points (resolve through the session registry). */
  def thetaAgg(c: Column): Column = call_function("theta_sketch_agg", c)
  def thetaUnion(a: Column, b: Column): Column =
    call_function("theta_union", a, b)
  def thetaIntersect(a: Column, b: Column): Column =
    call_function("theta_intersect", a, b)
  def thetaDiff(a: Column, b: Column): Column =
    call_function("theta_diff", a, b)
  def thetaEstimate(sk: Column): Column = call_function("theta_estimate", sk)

  /** The pair set-algebra columns over two sketch columns — THE one
    * definition of the overlap-triage stats (intersection / union /
    * exclusives / Jaccard), shared by AQL `SHOW OVERLAP` (pairwise and
    * N-way matrix) and the streaming grouped-overlap twin so the three
    * surfaces can never drift. An empty side/group aggregates to a NULL
    * sketch: union treats it as the empty set, intersect/diff propagate
    * NULL — coalesced to 0 (overlap with nothing IS nothing). */
  def overlapStats(ska: Column, skb: Column): Seq[Column] = {
    import org.apache.spark.sql.functions.{coalesce, lit, round, when}
    def est(sk: Column): Column = coalesce(thetaEstimate(sk), lit(0.0))
    val inter = est(thetaIntersect(ska, skb))
    val uni = est(thetaUnion(ska, skb))
    Seq(
      round(inter).cast("long").as("approx_intersect"),
      round(uni).cast("long").as("approx_union"),
      round(est(thetaDiff(ska, skb))).cast("long").as("approx_a_only"),
      round(est(thetaDiff(skb, ska))).cast("long").as("approx_b_only"),
      when(uni > 0, inter / uni).otherwise(lit(0.0)).as("jaccard"))
  }

  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
}

/** `theta_sketch_agg(col)` — the mergeable theta sketch of a column.
  * Accepts the same input types as Spark's `hll_sketch_agg`: integral,
  * string, binary (FLOAT/DOUBLE/BOOLEAN are rejected — bit-pattern
  * equality on floats is not a distinct-count anyone means).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaSketch.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "theta_sketch_agg expects an integral, string, or binary column, " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case i: Int => buffer.update(i.toLong)
      case l: Long => buffer.update(l)
      case s: Short => buffer.update(s.toLong)
      case b: Byte => buffer.update(b.toLong)
      case s: UTF8String => buffer.update(s.getBytes)
      case b: Array[Byte] => buffer.update(b)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unexpected input ${other.getClass.getName}")
    }
    buffer
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  /** An empty group (all inputs NULL) yields NULL, like min/max. */
  override def eval(buffer: Union): Any = {
    val result = buffer.getResult
    if (result.isEmpty) null else result.toByteArray
  }

  /** Partials cross the wire in compact-ORDERED form: smallest bytes and
    * the layout set-operation gadgets consume without re-sorting. */
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK)
    u.union(ThetaSketch.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Shared shape of the three pairwise theta set operations: binary in,
  * binary sketch out, per-PAIR work on KB payloads (CodegenFallback is
  * the honest cost — these run once per group pair, never per row).
  */
sealed abstract class ThetaSetOpExpr
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find(t => t != BinaryType && t != NullType)
      .map(t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary theta sketches, got ${t.catalogString}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  protected def combine(a: Sketch, b: Sketch): CompactSketch

  protected def evalPair(l: Any, r: Any): Any = (l, r) match {
    case (a: Array[Byte], b: Array[Byte]) =>
      combine(ThetaSketch.wrap(a), ThetaSketch.wrap(b)).toByteArray
    case _ => null
  }
}

/** `theta_union(a, b)` — NULL-tolerant (a NULL sketch is the empty set),
  * so fold code can merge a possibly-absent current sketch with a
  * possibly-absent delta without case analysis, like `kll_merge`. */
case class ThetaUnionExpr(left: Expression, right: Expression)
  extends ThetaSetOpExpr {
  override def prettyName: String = "theta_union"

  /** The union GADGET is sized to hold both inputs' retained entries: a
    * fixed-default gadget would downsample a pair of exact lgK=13
    * sketches to 2^12 and break the "exact below capacity" contract the
    * aggregate promises (intersection/difference never downsample, only
    * union does). Compact sketches don't carry their lgK, so size from
    * what they actually retain — still KB-scale. */
  override protected def combine(a: Sketch, b: Sketch): CompactSketch = {
    val retained = a.getRetainedEntries(true).toLong + b.getRetainedEntries(true)
    val lg = math.min(26, math.max(ThetaSketch.DefaultLgK,
      if (retained <= 1) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(retained - 1)))
    SetOperation.builder().setLogNominalEntries(lg).buildUnion().union(a, b)
  }

  override def eval(input: InternalRow): Any = (left.eval(input), right.eval(input)) match {
    case (null, null) => null
    case (a, null) => a
    case (null, b) => b
    case (l, r) => evalPair(l, r)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionExpr =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect(a, b)` — |A ∩ B| sketch; NULL propagates (an absent
  * side means the question is unanswerable, not "empty set" — a caller
  * holding an empty GROUP already received NULL from the aggregate). */
case class ThetaIntersectExpr(left: Expression, right: Expression)
  extends ThetaSetOpExpr {
  override def prettyName: String = "theta_intersect"

  override protected def combine(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildIntersection().intersect(a, b)

  override def eval(input: InternalRow): Any =
    evalPair(left.eval(input), right.eval(input))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** `theta_diff(a, b)` — |A \ B| sketch. A NULL left propagates NULL; a
  * NULL RIGHT subtracts the empty set (returns the left sketch), the
  * fold-friendly reading consistent with `theta_union`. */
case class ThetaDiffExpr(left: Expression, right: Expression)
  extends ThetaSetOpExpr {
  override def prettyName: String = "theta_diff"

  override protected def combine(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)

  override def eval(input: InternalRow): Any = (left.eval(input), right.eval(input)) match {
    case (null, _) => null
    case (a, null) => a
    case (l, r) => evalPair(l, r)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDiffExpr =
    copy(left = newLeft, right = newRight)
}

/** `theta_estimate(sk)` — the distinct-count estimate. NULL sketch → NULL
  * (the empty-group aggregate emitted NULL; estimate mirrors it). */
case class ThetaEstimateExpr(child: Expression)
  extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects a binary theta sketch, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => null
    case bytes: Array[Byte] => ThetaSketch.wrap(bytes).getEstimate
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
}
