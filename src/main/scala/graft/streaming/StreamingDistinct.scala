package graft.streaming

import graft.ops.{SampleOps, SketchOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count via HyperLogLog registers in
  * `mapGroupsWithState` — the CONSTANT-STATE alternative to
  * `dropDuplicates` distinct counting, whose state grows with the
  * number of distincts and dies first on a 100 TB stream. Here the
  * per-key state is exactly 2^b register bytes (256 B at b = 8)
  * forever, updates are register-max merges (idempotent under replay —
  * at-least-once delivery cannot inflate the estimate), and the
  * emitted estimate is bit-identical to the batch
  * [[graft.ops.SketchOps.hllEstimate]] over the same items
  * (spec-pinned), so batch backfills and the live stream agree.
  *
  * Plan shape: hashing is map-side codegen (the same seeded-md5
  * 60-bit idiom as the batch sketch); the only shuffle is the groupBy
  * key; state is timeout-free because it is bounded by construction.
  */
object StreamingDistinct {

  final case class KeyEstimate(key: String, n_items_seen: Long, estimate: Double)

  /** Per micro-batch, fold incoming (key, item) rows into the key's HLL
    * registers and emit the updated estimate. Output mode: update.
    */
  def distinctEstimates(rows: DataFrame, keyCol: String, itemCol: String,
                        b: Int = 8, seed: Long = 7L): Dataset[KeyEstimate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val m = 1 << b
    val maxRho = 60 - b + 1
    val hashed = rows
      .select(col(keyCol).cast("string").as("k"),
        SampleOps.seededHash(col(itemCol), seed).as("h"))
      .select(col("k"),
        col("h").bitwiseAND(lit(m - 1L)).cast("int").as("reg"),
        shiftright(col("h"), b).as("w"))
      .select(col("k"), col("reg"),
        when(col("w") === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("w")))).cast("int").as("rho"))
      .as[(String, Int, Int)]
    hashed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[(String, Int, Int)],
         state: GroupState[(Array[Int], Long)]) => {
          val (regs, seen0) = state.getOption.getOrElse((new Array[Int](m), 0L))
          var seen = seen0
          batch.foreach { case (_, reg, rho) =>
            if (rho > regs(reg)) regs(reg) = rho
            seen += 1
          }
          state.update((regs, seen))
          KeyEstimate(key, seen, SketchOps.estimateFromRegisters(regs, b))
        })
  }

  /** Batch twin over a static frame — the same fold, for parity pins
    * and backfills (groupBy + the batch register aggregate).
    */
  def distinctEstimatesBatch(rows: DataFrame, keyCol: String, itemCol: String,
                             b: Int = 8, seed: Long = 7L): DataFrame =
    SketchOps.hllEstimate(
      SketchOps.hllRegisters(
        rows.select(col(keyCol).cast("string").as("g"), col(itemCol).as("item")), b, seed), b)
      .select(col("g").as("key"), col("est").as("estimate"))

  /** Convenience: run a memory-sink update-mode query over a streaming
    * frame (dev/test harness; production picks its own sink/trigger).
    */
  def startMemorySink(est: Dataset[KeyEstimate], name: String) =
    est.writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
}
