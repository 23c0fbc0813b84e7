package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.operators.Incremental

/** The streaming face of [[graft.operators.Incremental]] — ties the
  * streaming layer to the LLM-data layer (round-7 verdict task 6): new
  * document deliveries land as parquet subfolders, a
  * `Trigger.AvailableNow` run curates ONLY the new docs against the
  * persisted store, and stops. The production cadence for a 100 TB
  * corpus: every crawl increment is one bounded run; nothing ever
  * re-scans the curated mass (the store contributes only its
  * normalized-hash column, O(docs-seen) keys, and the classifier/mixture
  * state is frozen by the [[Incremental]] contract, so verdicts are
  * stable by construction).
  *
  * Crash/replay discipline (the upsertAvailableNow pattern,
  * EventStreams.scala:242): per-batch verdicts are written to
  * `verdictDir/batch_<id>` with OVERWRITE — a replayed batch rewrites
  * the same directory, so verdict output is idempotent; the hash store
  * is merged (set union — idempotent) and stage-then-swapped, with
  * [[EventStreams.recoverStore]] healing a crash between the two swap
  * moves. Verdicts are written BEFORE the store swap: a crash between
  * the two redelivers the batch, and both writes are idempotent.
  */
object CurationStream {

  /** Start an AvailableNow curation run. `schema`: the document schema
    * (doc_id, lang, source, text). The returned query terminates when
    * all pending input files are processed. */
  def curationAvailableNow(spark: SparkSession, inputDir: String,
                           verdictDir: String, storeDir: String,
                           checkpoint: String, schema: StructType,
                           clsWeights: Option[DataFrame],
                           rates: Seq[(String, Long)],
                           nShards: Int = 8): StreamingQuery = {
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(inputDir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        EventStreams.recoverStore(storeDir)
        val store = new java.io.File(storeDir)
        val seen =
          if (store.exists()) spark.read.parquet(storeDir)
          else {
            import spark.implicits._
            Seq.empty[String].toDF("nh")
          }
        val state = Incremental.CurationState(seen, clsWeights, rates, nShards)
        Incremental.curateBatch(batch, state)
          .write.mode("overwrite").parquet(s"$verdictDir/batch_$batchId")
        val merged = seen
          .unionByName(batch.select(Incremental.normHash(col("text")).as("nh")))
          .distinct()
        val tmp = storeDir + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        EventStreams.swapInStore(tmp, storeDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
