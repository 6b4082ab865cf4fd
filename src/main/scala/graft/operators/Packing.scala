package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions._

/** Pretraining sequence packing: documents are concatenated in a
  * deterministic order (doc_id) and chunked into fixed token-budget
  * sequences — the standard "concat-and-chunk" data prep for LLM
  * pretraining. Each doc gets the sequence id and offset where its
  * tokens start.
  *
  * The global running token offset is a DISTRIBUTED prefix sum, not a
  * global window: a global `Window.orderBy(doc_id)` would sort the
  * whole corpus into one reducer. Instead:
  *   1. bucket docs by id range (`bucketSize` ids per bucket);
  *   2. per-bucket token totals — one tiny row per bucket;
  *   3. bucket start offsets via a window over the bucket TOTALS
  *      (rows = corpus/bucketSize — thousands, not billions; tune
  *      bucketSize up, or add a second level, if even that is big);
  *   4. broadcast the offsets back; within-bucket running sum is a
  *      bounded per-bucket window.
  * Every corpus-sized step is a keyed shuffle or map-only.
  */
object Packing {
  val DefaultBudget = 256L

  /** Generic prefix-sum packing over (idCol, tokensCol).
    *
    * TWO-level hierarchical offsets: buckets roll up into superbuckets
    * of `bucketSize` buckets each, so the only globally-ordered window
    * runs over corpus/bucketSize² rows (1000² docs per row at the
    * default) — 100 B docs is a 100-row global window. Bucket start
    * offsets are then a per-SUPERBUCKET window (≤ bucketSize rows per
    * partition), and doc offsets a per-bucket window. Each level's
    * output is bounded metadata and broadcasts; the corpus itself only
    * ever sees a keyed shuffle on its bucket. */
  def packByPrefix(df: DataFrame, idCol: String, tokensCol: String,
                   budget: Long, bucketSize: Long = 1000L): DataFrame = {
    val bucketed = df.withColumn("_bucket", expr(s"$idCol div $bucketSize"))
    val bucketTotals = bucketed.groupBy(col("_bucket"))
      .agg(sum(col(tokensCol)).as("_btotal"))
      .withColumn("_sb", expr(s"_bucket div $bucketSize"))
    // level 2: superbucket totals — corpus/bucketSize² rows; the ONLY
    // single-partition window, over genuinely tiny data
    val sbTotals = bucketTotals.groupBy(col("_sb"))
      .agg(sum(col("_btotal")).as("_sbtotal"))
    val wSb = Window.orderBy(col("_sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sbOffsets = sbTotals
      .withColumn("_sboffset", coalesce(sum(col("_sbtotal")).over(wSb), lit(0L)))
      .select(col("_sb"), col("_sboffset"))
    // level 1: bucket offsets — windows partitioned BY superbucket
    val wBuckets = Window.partitionBy(col("_sb")).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals.join(broadcast(sbOffsets), Seq("_sb"))
      .withColumn("_boffset",
        col("_sboffset") + coalesce(sum(col("_btotal")).over(wBuckets), lit(0L)))
      .select(col("_bucket"), col("_boffset"))
    // level 0: doc offsets — windows partitioned by bucket
    val wInner = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("start_offset",
        col("_boffset") + coalesce(sum(col(tokensCol)).over(wInner), lit(0L)))
      .withColumn("seq_id", expr(s"start_offset div $budget"))
      .withColumn("offset_in_seq", pmod(col("start_offset"), lit(budget)))
      .drop("_bucket", "_boffset")
  }

  /** Tar-shard size budget (bytes) for [[reshardPlan]]. */
  val ShardBudgetBytes = 65536L

  /** WebDataset RESHARD planning — the rebalancing job a training
    * fleet runs when shards have drifted from the I/O sweet spot:
    * assign every document's tar footprint (two ustar members, each
    * 512 B header + content rounded up to the 512 B block — the
    * [[graft.sources.TarShards]] layout arithmetic) to a byte-budgeted
    * shard by GLOBAL prefix sum, exactly as a sequential tar writer
    * that rolls to a new shard at each budget boundary would. The
    * prefix sum is the [[packByPrefix]] two-level hierarchy, so no
    * global row window ever materializes; the readout is one row per
    * planned shard with its fill. */
  def reshardPlan(spark: SparkSession, dir: String,
                  budget: Long = ShardBudgetBytes): DataFrame = {
    val sized = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"),
        (lit(1024L) +
          expr("((octet_length(text) + 511) div 512) * 512") +
          expr("((octet_length(source) + 511) div 512) * 512")).as("tar_bytes"))
    packByPrefix(sized, "doc_id", "tar_bytes", budget)
      .groupBy(col("seq_id").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        sum(col("tar_bytes")).as("shard_bytes"))
      .withColumn("fill_bp", expr(s"10000 * shard_bytes div $budget"))
      .orderBy(col("shard"))
  }

  /** Batch size (sequences per batch) for [[batchPaddingAudit]]. */
  val BatchSize = 8L
  /** Length-bucket width (tokens) for the bucketed strategy. */
  val LenBucketTokens = 32L

  /** Sequence-length BUCKETED BATCHING audit — the padding-waste
    * measurement behind "smart batching" (every fine-tuning harness'
    * `group_by_length`): a batch is padded to its longest member, so
    * arrival-order batches burn compute on pad tokens while
    * length-bucketed batches don't. Two deterministic strategies,
    * both chosen so NO global row sort exists at any scale:
    *
    *  - `arrival`: batch = doc_id div B (the stream order a naive
    *    loader uses) — one keyed aggregation;
    *  - `bucketed`: docs group into 32-token length buckets, batches
    *    form within a bucket by a per-BUCKET rank window (bounded
    *    partitions — the global order is never materialized).
    *
    * Per strategy: batches, real vs padded tokens, waste in exact bp
    * — the number that justifies the bucketing shuffle. */
  def batchPaddingAudit(spark: SparkSession, dir: String,
                        batch: Long = BatchSize): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("len"))
    def audit(tag: String, batched: DataFrame): DataFrame =
      batched.groupBy(col("bk"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("real"),
          max(col("len")).as("mx"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("real")).as("real_tokens"),
          sum(col("n") * col("mx")).as("padded_tokens"))
        .select(lit(tag).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          expr("10000 * (padded_tokens - real_tokens) div padded_tokens")
            .as("waste_bp"))
    val arrival = d.withColumn("bk", expr(s"doc_id div $batch"))
    val wBucket = Window.partitionBy(col("lb"))
      .orderBy(col("len"), col("doc_id"))
    val bucketed = d.withColumn("lb", expr(s"len div $LenBucketTokens"))
      .withColumn("rk", row_number().over(wBucket).cast("long"))
      .withColumn("bk", concat(col("lb"), lit("_"),
        expr(s"(rk - 1) div $batch")))
    audit("arrival", arrival).unionByName(audit("bucketed", bucketed))
      .orderBy(col("strategy"))
  }

  /** Packing of the `documents` table by whitespace token count. */
  def packDocuments(spark: SparkSession, dir: String,
                    budget: Long = DefaultBudget): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("tokens"))
    packByPrefix(d, "doc_id", "tokens", budget)
      .select(col("doc_id"), col("tokens"), col("seq_id"), col("offset_in_seq"))
      .orderBy(col("doc_id"))
  }

  /** Chunk-level packing — the composition of [[TextAnalysis
    * chunkDocuments]] (overlapping token windows) and the hierarchical
    * prefix sum: each 32/24-stride chunk gets its sequence id and
    * offset in the packed training stream, in deterministic
    * (doc_id, chunk_no) order. The synthetic chunk id doc_id·1024 +
    * chunk_no preserves that order for the prefix sum (chunk counts
    * per doc are far below 1024: stride 24 → 1024 chunks would need
    * a ~24k-token document; the budget check is the caller's).
    * Everything stays map-only + the packing's keyed windows. */
  def packChunks(spark: SparkSession, dir: String,
                 budget: Long = DefaultBudget): DataFrame = {
    val chunks = graft.operators.TextAnalysis.chunkDocuments(spark, dir)
      .select(col("doc_id"), col("chunk_no"), col("chunk_len"),
        (col("doc_id") * 1024 + col("chunk_no")).as("chunk_id"))
    packByPrefix(chunks, "chunk_id", "chunk_len", budget)
      .select(col("doc_id"), col("chunk_no"), col("chunk_len"),
        col("seq_id"), col("offset_in_seq"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }
}
