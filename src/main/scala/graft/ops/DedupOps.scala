package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable MinHash/LSH machinery (north-star dedup). Hash primitive is
  * md5 string-min — identical in Spark and DuckDB, so every derived
  * query stays oracle-checkable. All stages key on doc_id (+ optional
  * scope columns): keyed shuffles only, no all-pairs anywhere.
  */
object DedupOps {

  /** Distinct (scope…, doc_id, tok) unigrams of a text column. */
  def tokenSet(docs: DataFrame, textCol: String, scopeCols: Seq[String])(implicit s: SparkSession): DataFrame =
    docs.select((scopeCols :+ "doc_id").map(col) :+
      explode(split(trim(col(textCol)), "\\s+")).as("tok"): _*).distinct()

  /** k string-min md5 signatures per doc: min(md5(tok || '#' || seed)). */
  def minhashSignatures(toks: DataFrame, k: Int, scopeCols: Seq[String])(implicit s: SparkSession): DataFrame = {
    val seeds = s.range(k.toLong).select(col("id").as("seed"))
    toks.crossJoin(broadcast(seeds))
      .groupBy((scopeCols ++ Seq("doc_id", "seed")).map(col): _*)
      .agg(min(md5(concat(col("tok"), lit("#"), col("seed")))).as("mh"))
  }

  /** LSH bands of `rowsPerBand` signatures → one band_hash per (doc, band). */
  def lshBands(sig: DataFrame, rowsPerBand: Int, scopeCols: Seq[String]): DataFrame =
    sig.withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy((scopeCols ++ Seq("doc_id", "band")).map(col): _*)
      .agg(md5(concat(min(col("mh")), max(col("mh")))).as("band_hash"))

  /** Distinct candidate pairs (d1 < d2) sharing any band bucket within
    * the same scope — the bounded-shuffle alternative to all-pairs.
    */
  def candidatePairs(bands: DataFrame, scopeCols: Seq[String]): DataFrame = {
    val joinCols = scopeCols ++ Seq("band", "band_hash")
    val b1 = bands.select((joinCols :+ "doc_id").map(col): _*).withColumnRenamed("doc_id", "d1")
    val b2 = bands.select((joinCols :+ "doc_id").map(col): _*).withColumnRenamed("doc_id", "d2")
    b1.join(b2, joinCols).filter(col("d1") < col("d2")).select("d1", "d2").distinct()
  }
}
