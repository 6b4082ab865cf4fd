package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (JSON Lines) ingestion — the interchange format of
  * large-scale text/training-data pipelines (one JSON document per
  * line, splittable, append-friendly).
  *
  * Discipline mirrors the CSV staging path (SURVEY §1.3): an EXPLICIT
  * schema, never inference — at 100 TB schema inference is a full
  * extra pass, and a drifting producer would silently re-type the
  * table. Malformed lines are not dropped and do not fail the read:
  * PERMISSIVE mode quarantines each one into a corrupt-record column
  * so the pipeline can count, sample, and route them (the
  * dead-letter pattern) while clean rows flow on. The read is
  * map-only and splittable; corrupt handling adds no shuffle.
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read `dir` as JSONL with the declared schema; malformed lines
    * surface as rows whose `_corrupt_record` holds the raw line and
    * whose data columns are NULL. */
  def readWithQuarantine(spark: SparkSession, dir: String,
                         schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)

  /** Clean rows only (corrupt quarantined away). */
  def clean(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)

  /** Materialized split into (clean rows, raw malformed lines).
    *
    * Spark refuses a scan whose only referenced column is the corrupt
    * record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed
    * batch must be materialized before a corrupt-only projection. A
    * dead-letter route is inherently a materialization point (both
    * sides get written), so the split caches the parse once; callers
    * unpersist after sinking both sides. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (clean(cached),
      cached.filter(cached.col(CorruptCol).isNotNull).select(cached.col(CorruptCol)))
  }
}
