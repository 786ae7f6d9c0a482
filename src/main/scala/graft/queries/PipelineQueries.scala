package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Training-data-pipeline extensions through the driver gate (builder
  * prompt north-star): BPE-ish regex tokenization, the streaming window
  * surface run as a real Structured Streaming query, the multimodal
  * mapPartitions decode path, and cube/grouping_id (§2.D "free if
  * extended" closure).
  */
object PipelineQueries extends QueryModule {

  def queries: Seq[(String, NamedQuery)] = Seq(

    // ---------------------------------------------------------------- q59
    // BPE-ish regex tokenization (north-star "token counting:
    // whitespace + a BPE-ish regex"): letter runs, digit runs, and
    // single non-alnum marks as separate tokens — the pre-tokenizer
    // split GPT-style BPE vocabularies assume. Pure codegen'd column
    // expressions; identical RE semantics in Java regex and RE2.
    "q59_bpe_tokens" -> NamedQuery(
      fn = (s, d) => {
        val low = lower(col("text"))
        Tables.documents(s, d)
          .withColumn("n_word", size(regexp_extract_all(low, lit("[a-z]+"), lit(0))).cast("long"))
          .withColumn("n_num", size(regexp_extract_all(low, lit("[0-9]+"), lit(0))).cast("long"))
          .withColumn("n_mark", size(regexp_extract_all(low, lit("[^a-z0-9\\s]"), lit(0))).cast("long"))
          .withColumn("n_bpe_tokens", col("n_word") + col("n_num") + col("n_mark"))
          .select("doc_id", "n_word", "n_num", "n_mark", "n_bpe_tokens")
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_word,
               CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS n_num,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS BIGINT) AS n_mark,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                  + len(regexp_extract_all(lower(text), '[0-9]+'))
                  + len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        FROM documents
        ORDER BY doc_id"""),
      doc = "BPE-ish regex pre-tokenization counts (north-star)"),

    // ---------------------------------------------------------------- q60
    // The streaming surface through the correctness gate: the SAME
    // watermarked tumbling-window aggregation EventWindows ships runs
    // here as a real Structured Streaming query (file source over the
    // events parquet, AvailableNow semantics via processAllAvailable,
    // Complete mode to a memory sink) and must hash-match the batch
    // DuckDB oracle — incremental execution, identical answer.
    "q60_stream_hourly" -> NamedQuery(
      fn = (s, d) => {
        // the parquet file source lists a DIRECTORY — stage the single
        // events file into one (what a production stream's watched
        // landing dir is; at 100 TB this is the object-store prefix)
        val dir = java.nio.file.Files.createTempDirectory("q60_events")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/events.parquet"),
          dir.resolve("events.parquet"))
        val schema = Tables.load(s, d, "events").schema // ts as nanos long
        val stream = s.readStream.schema(schema).parquet(dir.toString)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        val windowed = stream
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .select(unix_micros(col("window.start")).as("window_start_us"),
            col("event_type"), col("n_events"), col("sum_value"))
        val q = windowed.writeStream.outputMode(OutputMode.Complete)
          .format("memory").queryName("q60_stream_hourly").start()
        try q.processAllAvailable() finally q.stop()
        s.table("q60_stream_hourly").orderBy("window_start_us", "event_type")
      },
      oracle = Some("""
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      doc = "Structured Streaming tumbling windows vs the batch oracle (§2.J)"),

    // ---------------------------------------------------------------- q61
    // Multimodal decode path through the gate: synthetic binary media
    // rows -> Dataset[MediaRow] -> mapPartitions feature extraction
    // (the Scala analog of mapInPandas batches; decode is the
    // deterministic stub) -> per-kind stats. The stub folds payload
    // bytes mod 8, so DuckDB reproduces feature[0] exactly from the
    // (all-ASCII) text bytes — the full iterator path is oracle-checked.
    "q61_media_features" -> NamedQuery(
      fn = (s, d) => {
        import graft.multimodal.MultimodalOps
        implicit val sp = s
        import s.implicits._
        val media = MultimodalOps.syntheticMedia(Tables.documents(s, d))
          .as[MultimodalOps.MediaRow]
        MultimodalOps.extractFeatures(media).toDF()
          .withColumn("f0", round(element_at(col("features"), 1), 6).cast(DecimalType(18, 6)))
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("f0")).cast("double").as("sum_f0"))
          .orderBy("kind")
      },
      oracle = Some("""
        WITH m AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS kind,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 round(list_sum(list_transform(range(1, length(text) + 1, 8),
                                               p -> ord(substr(text, p, 1)) / 255.0)), 6) AS f0
          FROM documents)
        SELECT kind, COUNT(*) AS n_media, SUM(n_bytes) AS total_bytes,
               CAST(SUM(CAST(f0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_f0
        FROM m
        GROUP BY kind
        ORDER BY kind"""),
      doc = "multimodal mapPartitions decode plumbing, stub-oracled (north-star)"),

    // ---------------------------------------------------------------- q62
    // Cube + grouping_id over (priority, status) — closes the §2.D
    // "grouping sets / cube" free-extension row (rollup is q20).
    // Spark's grouping_id bit order (first cube column = MSB) matches
    // DuckDB/Postgres GROUPING().
    "q62_cube_orders" -> NamedQuery(
      fn = (s, d) => {
        Tables.orders(s, d)
          .select("o_orderpriority", "o_orderstatus", "o_totalprice")
          .createOrReplaceTempView("q62_base")
        s.sql("""
          SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                 COALESCE(o_orderstatus, 'ALL') AS status,
                 CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM q62_base
          GROUP BY CUBE(o_orderpriority, o_orderstatus)
          ORDER BY priority, status""")
      },
      oracle = Some("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY priority, status"""),
      doc = "cube + grouping_id subtotal lattice (§2.D free extension)")
  )
}
