package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.streaming.{CurationStream, StatefulOps, StreamingOps, TwsOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (Spark implementation) and an
  * `oracles` map (equivalent DuckDB SQL over the same parquet tables, used by the
  * driver's correctness gate). Keys must match pairwise; column names and rounding
  * are aligned between the two (see graft.functions.Num).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (EventsOps.queries, EventsOps.oracles),
      (Generators.queries, Generators.oracles),
      (Diffusion.queries, Diffusion.oracles),
      (Metrics.queries, Metrics.oracles),
      (Reshape.queries, Reshape.oracles),
      (TextOps.queries, TextOps.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Relational.queries, Relational.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (TrendFit.queries, TrendFit.oracles),
      (StreamingOps.queries, StreamingOps.oracles),
      (CurationStream.queries, CurationStream.oracles),
      (Curation.queries, Curation.oracles),
      (CorpusQc.queries, CorpusQc.oracles),
      (Winnowing.queries, Winnowing.oracles),
      (PqOps.queries, PqOps.oracles),
      (OpqOps.queries, OpqOps.oracles),
      (SqOps.queries, SqOps.oracles),
      (BqOps.queries, BqOps.oracles),
      (graft.sources.Bucketed.queries, graft.sources.Bucketed.oracles),
      (graft.sources.Partitioned.queries, graft.sources.Partitioned.oracles),
      (graft.sources.Compaction.queries, graft.sources.Compaction.oracles),
      (graft.sources.SchemaEvolution.queries, graft.sources.SchemaEvolution.oracles),
      (graft.sources.Backfill.queries, graft.sources.Backfill.oracles),
      (graft.sources.ZOrder.queries, graft.sources.ZOrder.oracles),
      (StatsOps.queries, StatsOps.oracles),
      (EvalOps.queries, EvalOps.oracles),
      (TypedOps.queries, TypedOps.oracles),
      (StatefulOps.queries, StatefulOps.oracles),
      (TwsOps.queries, TwsOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventsOps.decompose(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
