package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextOps

/** Text-analysis operators over `documents` (builder-prompt north-star:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting). All are pure column expressions — codegen'd, no UDFs —
  * and each has an exact DuckDB oracle (md5 and regexp semantics align).
  */
object TextQueries extends QueryModule {

  def queries: Seq[(String, NamedQuery)] = Seq(

    // ---------------------------------------------------------------- q30
    // Token counting + quality scoring: whitespace tokens, char classes,
    // stopword ratio — length/punct/stopword quality heuristics.
    "q30_text_stats" -> NamedQuery(
      fn = (s, d) => {
        Tables.documents(s, d)
          .withColumn("n_tokens", TextOps.tokenCount(col("text")))
          .withColumn("n_punct", TextOps.punctCount(col("text")))
          .withColumn("n_stop", TextOps.stopwordCount(col("text")))
          .withColumn("avg_token_len", round(TextOps.avgTokenLen(col("text")), 6))
          .select("doc_id", "n_tokens", "n_punct", "n_stop", "avg_token_len")
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                  - len(regexp_split_to_array(trim(regexp_replace(' ' || text || ' ', ' (the|a|of|and|to|in) ', ' ', 'g')), '\s+')) AS BIGINT) AS n_stop,
               round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\s+')), 6) AS avg_token_len
        FROM documents
        ORDER BY doc_id"""),
      doc = "token count / quality scoring (north-star text analysis)"),

    // ---------------------------------------------------------------- q31
    // Language-ID heuristic: marker-token votes per language, argmax with
    // pinned tie-break; compared against the labeled lang column.
    "q31_langid" -> NamedQuery(
      fn = (s, d) => {
        val t = Tables.documents(s, d)
          .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
        def votes(markers: String) =
          size(split(col("padded"), s" ($markers) ")).cast("long") - 1L
        val scored = t
          .withColumn("v_en", votes("the|and|of"))
          .withColumn("v_es", votes("el|la|de"))
          .withColumn("v_de", votes("der|die|und"))
        val pred = scored.withColumn("pred_lang",
          when(col("v_en") >= col("v_es") && col("v_en") >= col("v_de"), "en")
            .when(col("v_es") >= col("v_de"), "es")
            .otherwise("de"))
        pred.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "pred_lang")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT lang,
                 CAST(len(regexp_split_to_array(' ' || text || ' ', ' (the|and|of) ')) AS BIGINT) - 1 AS v_en,
                 CAST(len(regexp_split_to_array(' ' || text || ' ', ' (el|la|de) ')) AS BIGINT) - 1 AS v_es,
                 CAST(len(regexp_split_to_array(' ' || text || ' ', ' (der|die|und) ')) AS BIGINT) - 1 AS v_de
          FROM documents)
        SELECT lang,
               CASE WHEN v_en >= v_es AND v_en >= v_de THEN 'en'
                    WHEN v_es >= v_de THEN 'es'
                    ELSE 'de' END AS pred_lang,
               COUNT(*) AS n_docs
        FROM scored
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      doc = "n-gram-marker language ID heuristic (north-star)"),

    // ---------------------------------------------------------------- q32
    // Document fingerprinting: md5 content fingerprint (identical in
    // Spark and DuckDB) over normalized text + length histogram.
    "q32_fingerprint" -> NamedQuery(
      fn = (s, d) => {
        Tables.documents(s, d)
          .withColumn("fp", TextOps.fingerprint(col("text")))
          .withColumn("len_bucket", expr("n_chars div 100"))
          .select("doc_id", "fp", "len_bucket")
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id, md5(lower(trim(text))) AS fp,
               n_chars // 100 AS len_bucket
        FROM documents
        ORDER BY doc_id"""),
      doc = "md5 document fingerprint (north-star)")
  )
}
