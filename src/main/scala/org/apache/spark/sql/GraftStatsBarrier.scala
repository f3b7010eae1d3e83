package org.apache.spark.sql

import org.apache.spark.sql.execution.LogicalRDD

/** Clamp for a Catalyst stats-propagation blowup on checkpointed
  * iteration chains (found r19, building the 32-round BPE depth panel).
  *
  * `Dataset.localCheckpoint(eager = false)` truncates the LOGICAL plan
  * at a [[LogicalRDD]] but forwards the origin plan's `Statistics`
  * (`originStats`) so downstream planning keeps size information. For an
  * iterative operator whose round plan references the previous round's
  * checkpoint K ≥ 2 times (a self-join — BPE's pair count + merge
  * application reference the segmentation three times), the size-only
  * stats visitor MULTIPLIES the inherited sizeInBytes per reference:
  * size_r ≈ size_{r-1}^K, so its BigInteger DIGIT COUNT doubles (K = 2)
  * or triples per round. By round ~20 the sizeInBytes carries millions
  * of digits and every join-strategy probe (`canBroadcastBySize`,
  * runtime-filter injection) runs Toom-Cook multiplications on it —
  * measured: planning one fixed-shape 40-node round grew 0.4 s → 90 s
  * between rounds 12 and 23, pure driver-side BigInteger arithmetic.
  *
  * The fix is a barrier at the truncation point: when a checkpoint's
  * inherited sizeInBytes exceeds [[GraftStatsBarrier.Cap]], drop
  * `originStats` so the leaf reverts to the planner's conservative
  * default size. The cap (1e36) is far above any real relation (an
  * exabyte is 1e18) and far below BigInteger pain, and because every
  * round passes through [[graft.Ckpt]], a runaway product is clamped on
  * its FIRST crossing — digits stay bounded for any round count.
  * Plans whose stats are sane keep them: broadcast-eligibility of
  * normal checkpointed relations is unchanged.
  *
  * Lives in `org.apache.spark.sql` for two `private[sql]` members
  * (`classic.Dataset.ofRows`, the `LogicalRDD` copy) — a read-repair of
  * Spark-internal state, not a behavior extension.
  */
object GraftStatsBarrier {

  /** Inherited-stats ceiling: 1e36 bytes (a million exabytes squared is
    * never a real size; a BigInt of ≤ 37 digits is always cheap).
    */
  private val Cap = BigInt(10).pow(36)

  /** `df` unchanged when its plan is not a stats-carrying checkpoint
    * leaf, or the carried size is plausible; otherwise the same
    * LogicalRDD with `originStats` dropped.
    */
  def clampOriginStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.logical match {
      case l: LogicalRDD if l.stats.sizeInBytes > Cap =>
        // rebuilt without originStats/originConstraints (both private —
        // no copy-by-name): the leaf reverts to the planner's default
        // size, and the constraint set of an already-implausible chain
        // is dropped with it (conservative: can only miss a pruning
        // opportunity, never misplan)
        classic.Dataset.ofRows(ds.sparkSession,
          new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            ds.sparkSession, None, None))
      case _ => df
    }
  }
}
