package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.A scans beyond parquet: the reference loads headered CSVs (A1),
  * typed CSVs (A2), and a remote TSV shipped as a local fixture (A5 —
  * no egress here). Explicit schemas everywhere: self-documenting and
  * skips the extra inference pass (SURVEY.md §1.3); multi-file loads go
  * through glob paths so the 17-weekly-file `bind_rows` (A3) is a single
  * distributed scan, not a loop.
  */
object TextSources {

  /** A1/A2 (Tutorial.R:11-19): headered CSV with explicit schema. */
  def csv(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    csv(spark, schema, Map.empty[String, String], paths: _*)

  /** A1/A2 with parser options (e.g. `multiLine` for embedded
    * newlines, `escape` for RFC-4180 quote-escaping — the settings a
    * text corpus needs; q163 gates the round-trip).
    */
  def csv(spark: SparkSession, schema: StructType, options: Map[String, String],
          paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "true").options(options).csv(paths: _*)

  /** A3 (Tutorial.R:15-20): the weekly-file union as one glob scan. */
  def csvGlob(spark: SparkSession, schema: StructType, glob: String): DataFrame =
    csv(spark, schema, glob)

  /** A5 (Field Control.R:108-118): tab-separated fixture. */
  def tsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    tsv(spark, schema, Map.empty[String, String], path)

  /** A5 with parser options (see the csv overload; q164 gates this). */
  def tsv(spark: SparkSession, schema: StructType, options: Map[String, String],
          path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").options(options)
      .option("sep", "\t").csv(path)

  /** JSON-lines scan (testdata `events.props` shape as a file format). */
  def jsonLines(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
