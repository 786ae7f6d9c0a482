package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared conf scope for the streaming gate queries' run-to-completion
  * harness. Two levers against the per-query scheduler floor (measured
  * round 9: ~11 s across the nine streaming gate queries at ANY SF —
  * pure micro-batch overhead, not data):
  *
  *  - `parts` state partitions: the count is captured from
  *    shuffle.partitions at query START and every partition pays a
  *    per-batch state-store commit — 4 is plenty at gate state sizes
  *    (measured round 16 across all 12 gate queries at sf0.1: 8→4 cut
  *    the set 30.7 s → 24.5 s, every query improved; 2 starts to lose
  *    parallelism on the join-heavy gates). 32 only multiplies commit
  *    overhead (measured round 2). Re-adjudicated round 17 after the
  *    round-16 driver run showed q123 +25% at parts=4: a fresh paired
  *    4-vs-8 A/B over all 12 gates measured 24.4 s vs 29.1 s with
  *    EVERY gate at-or-better at 4 (q123 itself 3.97 s vs 5.47 s, the
  *    largest margin of the set) — the driver's single reading was
  *    run-to-run noise, not the partition count (and the co-reported
  *    "q120 regression" is a batch session_window query this scope
  *    never touches). Production unbounded streams size state
  *    partitions to their key cardinality and pass `parts` explicitly
  *    — the default is the bounded-replay harness value;
  *  - no-data micro-batches DISABLED for the body's lifetime: every
  *    gate query emits inside data batches (sentinel flushes — q74/
  *    q123, match-time emission — q78/q81/q153, or Complete mode —
  *    q60/q80/q109), so the trailing watermark-advance batch only adds
  *    a full re-plan + per-partition state commit per query. A query
  *    whose OUTPUT depends on a trailing no-data batch (e.g. an
  *    append-mode windowed aggregate flushed by watermark alone, with
  *    no sentinel) must NOT use this scope — emission would silently
  *    wait for data that never comes.
  *
  * Unlike the old inline pattern (restore right after start), the conf
  * must stay set for the query's LIFETIME: noDataMicroBatches is read
  * at every trigger decision, not once at start.
  */
object GateRun {

  /** Scale-adaptive state-partition count for the bounded-replay gates
    * (round-17; the guide's "derive partitioning from input size, not a
    * constant tuned for one mode"): one state partition per 16 MB of
    * staged replay input, floor 4, cap 32.
    *
    *  - floor 4 = the sf0.1-measured optimum (two full paired A/Bs,
    *    rounds 16 and 17: every gate at-or-better at 4 vs 8 — gate
    *    state is tiny there and each partition pays a per-batch
    *    state-store commit). At sf0.1 (2 MB staged) the formula yields
    *    exactly 4, so the driver-bench surface is unchanged and the
    *    sf0.1 A/B evidence carries over bit-for-bit (12/12 gate
    *    hash-match re-verified after this change);
    *  - growth with input is a CLUSTER-correctness bound, not a local
    *    speedup claim: the single-batch replay holds the whole
    *    corpus's state (q81's dedup keys, q80's Complete windows), and
    *    state partitions are the unit that spreads that state across
    *    executors — a constant 4 pins per-executor state to
    *    state/4 at any scale. The round-17 sf10 revalidation measured
    *    the failure concretely (q81 at 4 parts OOMs the default 8 GB
    *    local heap; with SPARK_DRIVER_MEM=48g it completes) but could
    *    NOT rank 4 vs 8 vs 9 parts on wall time — four sf10 readings
    *    spanned 68-129 s with no consistent ordering (box noise
    *    dominates sf10 streaming walls on shared hardware). In local
    *    mode all partitions share one heap, so the OOM fix is the heap,
    *    not the partition count; on a cluster the partition count IS
    *    the per-executor bound, which is why it must scale;
    *  - cap 32: past one partition per core the commits dominate again
    *    (measured round 2).
    *
    * Production unbounded streams still size state partitions to key
    * cardinality explicitly.
    */
  def scaledParts(staged: java.io.File, floor: Int = 4, cap: Int = 32): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(bytes).sum).getOrElse(0L)
      else f.length()
    math.max(floor, math.min(cap, (bytes(staged) >> 24).toInt))
  }

  def withStreamGateConfs[T](s: SparkSession, parts: Int = 4,
                             extra: Map[String, String] = Map.empty)(body: => T): T = {
    val prevExtra = extra.keys.map(k => k -> s.conf.getOption(k)).toMap
    extra.foreach { case (k, v) => s.conf.set(k, v) }
    try withStreamGateConfsBase(s, parts)(body)
    finally prevExtra.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def withStreamGateConfsBase[T](s: SparkSession, parts: Int)(body: => T): T = {
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ckptKey = "spark.sql.streaming.checkpointLocation"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = s.conf.getOption(noDataKey)
    val prevCkpt = s.conf.getOption(ckptKey)
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set(noDataKey, "false")
    // Checkpoint (offset WAL + state deltas) on tmpfs when available:
    // these writes are rename-committed and fsync'd, and /tmp here is
    // ext4 — each batch pays several forced disk syncs for a gate run
    // whose checkpoint is deliberately throwaway. A FRESH dir per run:
    // a base + queryName checkpoint surviving into a second invocation
    // would make the restarted query replay nothing into an empty
    // memory sink. Production runs set a durable checkpointLocation
    // explicitly and never pass through this scope.
    val shm = new java.io.File("/dev/shm")
    val base = new java.io.File(
      if (shm.isDirectory && shm.canWrite) shm else new java.io.File(sys.props("java.io.tmpdir")),
      s"graft_gate_ckpt_${java.util.UUID.randomUUID().toString.take(8)}")
    base.mkdirs()
    s.conf.set(ckptKey, base.getAbsolutePath)
    try body
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => s.conf.set(noDataKey, v)
        case None    => s.conf.unset(noDataKey)
      }
      prevCkpt match {
        case Some(v) => s.conf.set(ckptKey, v)
        case None    => s.conf.unset(ckptKey)
      }
      graft.queries.TempPaths.delete(base)
    }
  }
}
