package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization pins for frames with multiple downstream consumers.
  *
  * `eager` is the ONLY sanctioned way to pin a frame that broadcast
  * exchanges will consume concurrently (q88/q101's weighted index,
  * q92/q95's PQ codebook union).  It must stay EAGER: a *lazy*
  * `localCheckpoint` first materializes inside whichever consumer
  * thread touches it first, and when that thread is a broadcast-
  * exchange thread the job wedges — the r11 production deadlock:
  *
  *   broadcast thread: holds the global `RDDCheckpointData` lock
  *                     (entered via `doCheckpoint()`), wants the RDD's
  *                     partitions lock to run the materializing job;
  *   DAG scheduler:    holds the RDD's lock while resolving stages,
  *                     wants the global checkpoint lock.
  *
  * Eager materialization runs the checkpoint job HERE, on the main
  * thread, before any consumer exists — every broadcast that follows
  * only reads the already-computed blocks.  PinsSpec proves the
  * materialize-before-return behavior (an accumulator bumps during the
  * `eager` call itself) and UtilSpec's source gate keeps the two hot
  * call sites routed through this helper, so an "optimize to lazy"
  * edit goes red in seconds instead of wedging a bench three rounds
  * later.  Lazy pins (`localCheckpoint(false)`) remain correct — and
  * preferred, they piggyback materialization on the first action —
  * for frames whose consumers are sequential on the main thread
  * (Reindex.chunked, sequencePacking, connectedComponents supersteps).
  */
object Pins {
  def eager(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
