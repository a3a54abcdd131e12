package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface (graft.plans.GraftExtensions): the
  * shared test session is built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (see TestSession), so
  * these tests drive the same injection path a cluster deployment uses.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_cosine_sim is injected and computes the fused kernel in SQL") {
    val r = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d, 0.0d), array(1.0d, 0.0d, 0.0d)) AS same," +
        " graft_cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS ortho," +
        " graft_cosine_sim(array(1.0d, 2.0d), array(-1.0d, -2.0d)) AS opposite").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("graft_l2_sq is injected and matches the composed-column form") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 6.0, 8.0))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val sqlV = spark.sql("SELECT graft_l2_sq(a, b) AS d FROM ext_vecs").head().getDouble(0)
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("d")).head().getDouble(0)
    assert(sqlV == composed)
    assert(sqlV == 9.0 + 16.0 + 25.0)
  }

  test("SQL and Column API route to the same native expression (codegen plan)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 0.0), Array(0.5, 0.5))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs2")
    val viaSql = spark.sql("SELECT graft_cosine_sim(a, b) AS c FROM ext_vecs2")
    val viaCol = df.select(graft.plans.VectorFunctions.cosine_sim(col("a"), col("b")).as("c"))
    // analyzed (pre-optimization) plan: the optimizer constant-folds the
    // literal fixture into a LocalRelation, which is itself evidence the
    // expression is a first-class foldable Catalyst citizen
    assert(viaSql.queryExecution.analyzed.toString.toLowerCase.contains("cosinesimilarity"))
    assert(viaSql.head().getDouble(0) == viaCol.head().getDouble(0))
  }

  test("DESCRIBE FUNCTION surfaces the registered usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION graft_cosine_sim")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_cosine_sim"))
  }

  test("runtime install on an extension-less session is idempotent") {
    // installing over the already-extension-built session must not throw and
    // must leave the function callable
    graft.plans.GraftExtensions.install(spark)
    graft.plans.GraftExtensions.install(spark)
    val v = spark.sql("SELECT graft_cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
