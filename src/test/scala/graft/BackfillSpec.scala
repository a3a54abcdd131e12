package graft

import graft.sources.Backfill
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite must be surgical: backfilling one date
  * replaces exactly that partition's files and leaves every other partition's
  * files (names AND modification times) untouched — the guarantee that makes
  * daily backfill safe to run against a live table.
  */
class BackfillSpec extends SparkSpec {

  private def listFiles(p: Path): Map[String, Long] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else
      fs.listStatus(p).filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(s => s.getPath.toString -> s.getModificationTime).toMap
  }

  test("backfill rewrites only the target date partition") {
    Backfill.ensure(spark, sf)
    val loc = Backfill.location(spark)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(loc).filter(_.isDirectory).map(_.getPath)
    assert(parts.nonEmpty)
    val untouched = parts.filterNot(_.getName.endsWith(Backfill.BackfillDate))
    assert(untouched.nonEmpty)
    val before = untouched.map(p => p -> listFiles(p)).toMap

    // re-deliver the backfill date once more (same corrected content, so the
    // shared layout stays semantically identical for any other reader in
    // this JVM): dynamic overwrite must replace ONLY that partition
    val ev = graft.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date") === lit(Backfill.BackfillDate).cast("date"))
      .withColumn("value", col("value") * 2.0)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try ev.write.partitionBy("event_date").mode("overwrite").parquet(loc.toString)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    untouched.foreach { p =>
      assert(listFiles(p) == before(p), s"partition $p was touched by the backfill")
    }
    // and the target partition still holds exactly its day's rows
    val n = spark.read.parquet(loc.toString)
      .filter(col("event_date") === lit(Backfill.BackfillDate).cast("date")).count()
    assert(n == ev.count())
  }
}
