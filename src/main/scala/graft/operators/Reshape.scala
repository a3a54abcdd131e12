package graft.operators

import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Patchify / unpatchify reshaping (SURVEY.md §2.6 S4-S5; reference
  * models/diffusion_ts_model.py:445-470): seq → fixed-size patches as array
  * columns, and the posexplode inverse. seqLen % patchSize must hold — the
  * reference silently truncates (§7.6.5); we validate.
  *
  * Scale: patchify is a single hash-agg keyed by (series, patch) — the natural
  * co-partitioning for any later per-patch operator; no second shuffle needed
  * for unpatchify (posexplode is a narrow generator).
  */
object Reshape {
  val PatchSize = 4 // config.json:15

  /** S4: (series_id, patch_id, values ARRAY<double>) with in-patch time order. */
  def patchify(spark: SparkSession, df: DataFrame, patchSize: Int = PatchSize): DataFrame = {
    require(patchSize > 0)
    df.withColumn("patch_id", (col("t") / patchSize).cast("int"))
      .groupBy("series_id", "patch_id")
      .agg(transform(sort_array(collect_list(struct(col("t"), col("value")))),
        x => x.getField("value")).as("values"))
  }

  /** S5: inverse — recover (series_id, t, value) from patches. */
  def unpatchify(df: DataFrame, patchSize: Int = PatchSize): DataFrame =
    df.select(col("series_id"), col("patch_id"), posexplode(col("values")))
      .select(col("series_id"),
        (col("patch_id") * patchSize + col("pos")).cast("int").as("t"),
        col("col").as("value"))

  /** Oracle-friendly per-patch stats (array columns stay out of the hash compare). */
  def patchStats(spark: SparkSession): DataFrame =
    patchify(spark, Generators.dataset(spark, "mixed", 20, 64))
      .select(col("series_id"), col("patch_id"),
        size(col("values")).cast("long").as("patch_len"),
        r6(aggregate(col("values"), lit(0.0), (acc, x) => acc + x)).as("patch_sum"))

  /** S4∘S5 = id, checked against an independent SQL derivation of the dataset. */
  def roundtrip(spark: SparkSession): DataFrame =
    unpatchify(patchify(spark, Generators.dataset(spark, "mixed", 20, 64)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "patchify_stats" -> ((s, _) => patchStats(s).orderBy("series_id", "patch_id")),
    "unpatchify_roundtrip" -> ((s, _) => roundtrip(s).orderBy("series_id", "t"))
  )

  def oracles: Map[String, String] = Map(
    "patchify_stats" ->
      s"""WITH ds AS (${Generators.datasetSqlCore("mixed", 20, 64)})
         |SELECT series_id, CAST(floor(t / $PatchSize) AS INT) AS patch_id,
         |       count(*) AS patch_len,
         |       ${sqlR6(s"list_sum(list(value ORDER BY t))")} AS patch_sum
         |FROM ds GROUP BY 1, 2 ORDER BY series_id, patch_id""".stripMargin,
    "unpatchify_roundtrip" ->
      (Generators.datasetSqlCore("mixed", 20, 64) + " ORDER BY series_id, t")
  )
}
