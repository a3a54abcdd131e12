package graft.streaming

import graft.operators.{Curation, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus-curation ingest — the incremental twin of
  * [[graft.operators.Curation.curated]]: documents arrive as files, each
  * micro-batch applies the PER-DOC gates (quality score + language-tag
  * agreement) as pure projections, and exact dedup suppresses replays across
  * micro-batches via `dropDuplicates` state on the content fingerprint.
  *
  * What deliberately stays OUT of the incremental pass: near-duplicate (LSH)
  * demotion. Pair discovery is inherently cross-batch (today's doc can demote
  * one ingested last week), so production splits exactly this way — per-doc
  * gates + exact-fingerprint suppression at ingest, periodic batch LSH
  * compaction behind it ([[graft.operators.Dedup]]). Registering that split
  * here makes the boundary explicit instead of pretending the whole
  * composition streams.
  *
  * State note: the documents table carries no event time, so the fingerprint
  * state is unbounded (`dropDuplicates`, not `dropDuplicatesWithinWatermark`).
  * With ingest timestamps the watermarked form drops in unchanged — proven on
  * events in [[StreamingOps.dedupWithinWatermark]]; the corpus-side contract
  * (suppress exact replays across micro-batches) is what CurationStreamSpec
  * proves.
  */
object CurationStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Incremental file source over a fixture dir's documents.parquet. */
  def docsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** The per-doc gate + cross-batch exact-dedup pass, written against a plain
    * DataFrame so the same code plans as a batch query (the spec's oracle
    * side) or an incremental streaming query. Gates are ONE narrow projection
    * (the column-level quality/langid builders — no join in the micro-batch
    * path); the only stateful operator is the fingerprint dropDuplicates.
    */
  def curatedIngest(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
        TextOps.nWordsCol.as("n_words"),
        TextOps.qualityScoreCol.as("quality_score"),
        (TextOps.predLangCol === col("lang")).as("matches_tag"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
      .filter(col("quality_score") >= Curation.QualityMin && col("matches_tag"))
      .select("doc_id", "lang", "source", "n_words", "quality_score", "fp")
      .dropDuplicates("fp")
}
