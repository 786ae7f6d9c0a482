package graft.ops

import org.apache.spark.sql.DataFrame

/** Guard rails for the declared O(n²) correctness baselines (q34 in-
  * bucket all-pairs Jaccard, q37 brute-force cosine, q39 all-pairs
  * near-dup). Those queries exist to ORACLE the scale paths (banded
  * MinHash/SimHash, LSH buckets, IVF cells) — they must never be pointed
  * at a corpus-scale input, where n² work is a silent cluster-killer.
  * The guard fails fast instead, naming the gated production successor
  * a caller should use at scale (SCALING.md "all-pairs baselines";
  * CATALOG.md pairs each baseline with its successor: q34 → q212
  * prefix-filter threshold join, q37 → q210 bounded IVF serving /
  * q144 PQ-ADC, q39 → q38/q40 LSH-IVF cell joins + q65/q176 semantic
  * dedup).
  */
object ScaleGuards {

  /** A guard REFUSAL, as its own type so tooling can tell a by-design
    * fail-fast from a real breakage (round-15 verdict task 3: sf10+
    * sweeps recorded q34/q37/q39/q218 guard trips in the same error
    * bucket as genuine failures). Bench catches this and reports the
    * query as skipped-by-guard with the named successor, not as an
    * error. Extends IllegalArgumentException so any caller that handled
    * the old require() failure mode keeps working.
    */
  final class ScaleGuardTrip(val what: String, val successor: String, msg: String)
    extends IllegalArgumentException(msg)

  /** Rows above which an all-pairs baseline refuses to run. 50k rows is
    * already ~1.25B pairs — far past any sane baseline/oracle run, and
    * early enough that the failure costs seconds, not cluster-days.
    */
  val DefaultMaxAllPairsRows = 50000L

  /** Fail fast if `df` is larger than the all-pairs bound. The check
    * scans at most bound+1 rows (limit short-circuits — it never counts
    * the full input), so the guard itself stays O(bound) at any scale.
    * Deliberate larger runs can raise the bound via the session conf
    * `spark.graft.allPairs.maxRows`.
    */
  def requireAllPairsSafe(df: DataFrame, what: String,
                          successor: String = "its banded-LSH / IVF-cell scale path"): DataFrame = {
    val bound = df.sparkSession.conf
      .getOption("spark.graft.allPairs.maxRows")
      .map(_.toLong).getOrElse(DefaultMaxAllPairsRows)
    require(bound >= 0 && bound < Int.MaxValue,
      s"spark.graft.allPairs.maxRows=$bound out of range [0, ${Int.MaxValue - 1}] " +
        "(limit() takes an Int; a larger bound would overflow the probe)")
    val n = df.limit((bound + 1).toInt).count()
    if (n > bound)
      throw new ScaleGuardTrip(what, successor,
        s"$what is an O(n²) all-pairs correctness baseline; input exceeds " +
          s"$bound rows (≥$n). Use its gated production successor — $successor — " +
          "or raise spark.graft.allPairs.maxRows for a deliberate oracle run.")
    df
  }
}
