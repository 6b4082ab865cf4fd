package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Write-layout utilities: sorted row groups actually narrow parquet
  * min/max stats, and compaction reduces file counts losslessly. */
class SinksSpec extends SparkSpec {

  test("writeSorted range-clusters files: per-file spans are a fraction of global") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .repartition(8) // scatter dates across partitions first
    Sinks.writeSorted(li, s"$dir/sorted", Seq("l_shipdate"))
    val perFile = spark.read.parquet(s"$dir/sorted")
      .select(input_file_name().as("f"), unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .groupBy(col("f"))
      .agg(min("us").as("lo"), max("us").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(perFile.length > 1)
    assert(perFile.map(_.getAs[Long]("n")).sum === li.count())
    val globalLo = perFile.map(_.getAs[Long]("lo")).min
    val globalHi = perFile.map(_.getAs[Long]("hi")).max
    val spans = perFile.map(r => r.getAs[Long]("hi") - r.getAs[Long]("lo"))
    // range clustering: average per-file span well under the global span
    assert(spans.sum / spans.length < (globalHi - globalLo) / 2,
      s"avg span ${spans.sum / spans.length} vs global ${globalHi - globalLo}")
  }

  test("compact merges many small files into few, losslessly") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.repartition(64).write.parquet(s"$dir/t") // 64 tiny files
    val before = new java.io.File(s"$dir/t").listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32)
    val rowsBefore = spark.read.parquet(s"$dir/t").count()
    val parts = Sinks.compact(spark, s"$dir/t", targetMb = 128)
    val after = new java.io.File(s"$dir/t").listFiles().count(_.getName.endsWith(".parquet"))
    assert(after.toLong === parts && after < before)
    assert(spark.read.parquet(s"$dir/t").count() === rowsBefore)
  }
}
