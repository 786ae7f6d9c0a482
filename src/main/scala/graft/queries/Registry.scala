package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame program over the driver's
  * parquet tables plus (optionally) an equivalent DuckDB SQL oracle the
  * driver hash-compares against (SparkEntry contract).
  *
  * Oracle parity rules used throughout (so Spark and DuckDB agree
  * bit-for-bit):
  *  - sums/avgs of doubles go through DECIMAL(18,2) casts (exact,
  *    order-independent) and back to DOUBLE;
  *  - transcendental math (trig/exp/pow) is rounded to 6 decimals —
  *    JVM and libm may differ in the last ulp;
  *  - extracted integers (year, substring-casts) are cast to BIGINT to
  *    match DuckDB's default integer width;
  *  - every query ends in an explicit ORDER BY on a unique key.
  */
final case class NamedQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Session-scoped temp dirs for queries that stage files on local disk
  * (partitioned/bucketed write round-trips, streaming source dirs).
  * Fixed per-(query, application) path + overwrite semantics: re-runs
  * within a session REPLACE the copy instead of leaking one dir per
  * invocation (fn runs on every verify/bench/plan-dump pass), the
  * applicationId suffix keeps concurrent drivers from cross-writing
  * each other's copies, and a JVM shutdown hook removes this session's
  * dirs so re-runs of the app don't accumulate either.
  */
object TempPaths {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dir(s: SparkSession, name: String): java.io.File = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${name}_${s.sparkContext.applicationId}")
    f.mkdirs()
    if (registered.add(f.getAbsolutePath))
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(f)))
    f
  }

  /** Stage `src` into session dir `name`; returns the dir path — e.g. a
    * streaming file source's watched dir. `src` may be either shape a
    * table ships in: a single parquet FILE (the driver's testdata
    * layout — copied as `fileName`) or a parallel-written DIRECTORY of
    * part files (ScaleData's ≳256 MB layout — its `*.parquet` parts are
    * copied flat into the staged dir, where the file source lists them
    * all; a bare Files.copy of a directory would stage an EMPTY dir and
    * the stream would read 0 rows). The dir is cleared first so a
    * re-stage mirrors the current input exactly in both shapes.
    */
  def stageFile(s: SparkSession, name: String, src: String, fileName: String): java.io.File = {
    val d = freshDir(s, name)
    val from = new java.io.File(src)
    if (from.isDirectory) {
      val parts = from.listFiles().filter(_.getName.endsWith(".parquet"))
      require(parts.nonEmpty, s"stageFile: directory $src has no *.parquet part files")
      parts.foreach(p => java.nio.file.Files.copy(p.toPath, d.toPath.resolve(p.getName)))
    } else {
      java.nio.file.Files.copy(from.toPath, d.toPath.resolve(fileName))
    }
    d
  }

  /** A session dir as in `dir`, but with any contents from a previous
    * run in the same session removed first — for staging steps whose
    * file SET must exactly mirror the current input (a stale file from
    * an earlier, larger dataset would survive a glob read and produce
    * rows the oracle doesn't have).
    */
  def freshDir(s: SparkSession, name: String): java.io.File = {
    val f = dir(s, name)
    Option(f.listFiles()).foreach(_.foreach(delete))
    f
  }

  // also the vacuum primitive (q131): retention = recursive delete of
  // superseded snapshot dirs
  def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}

trait QueryModule {
  def queries: Seq[(String, NamedQuery)]

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.sum
  import org.apache.spark.sql.types.DecimalType

  /** The exact-decimal sum idiom from the parity rules above, shared so
    * the recipe has ONE spelling: DECIMAL(18,2) per-term cast (exact,
    * order-independent across any partitioning), decimal SUM, back to
    * DOUBLE. DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  protected def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
