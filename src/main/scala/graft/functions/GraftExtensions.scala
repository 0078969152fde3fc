package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions installing graft's native Catalyst functions and
  * planner strategies — the public `SparkSessionExtensions` registration
  * path (builder.withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.functions.GraftExtensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinHashSlices].getName, "minhash_slices"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSlices(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HyperplaneBucket(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("float32_unpack"),
      new ExpressionInfo(classOf[Float32Unpack].getName, "float32_unpack"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Float32Unpack(exprs.head)))
    // KLL quantile sketch trio (mirrors Spark's own DataSketches HLL
    // surface): mergeable aggregate, pairwise union, rank-q estimate
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllSketchAgg(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[KllMergeExpr].getName, "kll_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllMergeExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantileExpr].getName, "kll_quantile"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllQuantileExpr(exprs(0), exprs(1))))
    // whole-operator custom path: per-group top-k (graft.plans.TopKPerGroup)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
