package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so a SQL-only user gets the fused
  * codegen kernels (`graft_cosine_sim`, `graft_l2_sq`) without touching the
  * Scala API. Deployment shape is the standard one for Catalyst-extending
  * libraries: `--conf spark.sql.extensions=graft.plans.GraftExtensions` (the
  * engine's own mains set it on their builders; ExtensionsSpec drives the
  * SQL surface end to end).
  *
  * Only `injectFunction` is used deliberately: the engine needs no custom
  * optimizer `Rule` or `SparkStrategy` (SURVEY §4 — every operator's plan is
  * already the one Catalyst picks), so injecting no-op rules would be
  * padding, not capability.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Name → (info, builder) for every SQL-exposed native expression. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, null,
        "graft_cosine_sim",
        "graft_cosine_sim(a, b) - cosine similarity of two ARRAY<DOUBLE> vectors (fused single-pass codegen kernel)",
        ""),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    (FunctionIdentifier("graft_l2_sq"),
      new ExpressionInfo(classOf[L2SqDistance].getCanonicalName, null,
        "graft_l2_sq",
        "graft_l2_sq(a, b) - squared L2 distance of two ARRAY<DOUBLE> vectors (fused single-pass codegen kernel)",
        ""),
      (args: Seq[Expression]) => L2SqDistance(args.head, args(1))),
  )

  /** Runtime fallback for a session built without the extensions conf
    * (idempotent): registers the same functions into the live registry.
    */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      Bridge.registerFunction(spark, ident, info, builder)
    }
}
