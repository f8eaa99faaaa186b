package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Pinned-count repartition for CPU-bound stages.
  *
  * AQE's partition coalescing targets BYTES per partition
  * (`spark.sql.adaptive.advisoryPartitionSizeInBytes`) and is blind to
  * per-row CPU: a regex/scoring-UDF stage whose input is a few MB gets
  * coalesced to 1–3 partitions and runs effectively single-threaded
  * (measured on the tagger's rank stage: 505k rows × ~9µs/row = 4.4s on
  * 3 of 32 cores). A repartition with an EXPLICIT count
  * (REPARTITION_BY_NUM) is exempt from AQE coalescing, so the stage keeps
  * cluster-wide parallelism. The pinned count is
  * `spark.sql.shuffle.partitions`, which the cluster tunes with its size —
  * at 100 TB the same call simply distributes on the cluster's configured
  * width, and the joined/window stages downstream reuse the partitioning
  * (no extra exchange).
  */
object CpuSpread {
  def byKey(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys: _*)
}
