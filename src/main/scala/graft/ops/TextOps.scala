package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-analysis column expressions (north-star text ops).
  * All pure `Column` arithmetic — codegen'd, no UDFs — and written to
  * behave identically in the DuckDB oracle dialect (see TextQueries /
  * CorpusQueries for the paired SQL).
  *
  * Edge semantics (pinned by TextOpsSpec): an empty or all-whitespace
  * string splits to one empty token, so `tokenCount` is 1 there —
  * callers that need 0-for-empty should guard with `length(trim(c)) >
  * 0`. This mirrors both engines' split semantics rather than hiding
  * them.
  */
object TextOps {

  val Stopwords = "the|a|of|and|to|in"

  /** Whitespace token count (long). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** Count of stopword tokens (space-delimited, non-overlapping scan). */
  def stopwordCount(text: Column): Column =
    tokenCount(text) - size(split(trim(regexp_replace(
      concat(lit(" "), text, lit(" ")), s" ($Stopwords) ", " ")), "\\s+")).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  /** Mean token length (chars sans whitespace / token count). */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  /** md5 fingerprint of normalized content (exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(text)))

  /** Strip URLs, emails and digit runs (corpus cleaning). */
  def cleaned(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "https?://\\S+", " "),
        "\\S+@\\S+\\.\\S+", " "),
      "[0-9]+", " ")

  // PII patterns shared by the redactor and its counters. ASCII-only and
  // RE2-compatible (no backrefs/lookaround), so Java regex and DuckDB
  // agree on every match.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** PII redaction (north-star corpus compliance): emails, IPv4
    * addresses, and phone-like digit groups each replaced by a typed
    * placeholder. Order matters — emails first (they contain dots and
    * digits), then IPs (dotted digits), then bare phone groups. Pure
    * codegen'd regexp_replace chain, map-only at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
