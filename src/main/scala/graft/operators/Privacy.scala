package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** PII scrubbing — the redaction pass every released pretraining corpus
  * runs (emails, IPv4 addresses, international phone numbers → typed
  * placeholder tokens, plus per-document match counts for audit trails).
  *
  * A pure per-row map: no shuffle, no UDF — `regexp_replace` /
  * `regexp_extract_all` are codegen'd builtins, so at 100 TB this is one
  * scan at IO speed. The patterns are deliberately RE2-SAFE (no
  * lookaround, no backreferences), which keeps the exact same pattern text
  * semantically identical under Java regex (Spark) and RE2 (DuckDB) — that
  * is what makes q74 a full cross-engine oracle rather than a rows-only
  * check.
  *
  * Counts are measured per pattern on the ORIGINAL text; replacement is
  * sequential email → IP → phone.
  */
object Privacy {

  /** RFC-casual email matcher (the standard corpus-scrub pattern, not a
    * full RFC 5321 parser — that is a feature: over-redaction beats leaks).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 with word boundaries (octet range not validated —
    * same over-redaction stance).
    */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-format phone: + followed by 7-15 digits (E.164). */
  val PhonePattern = "\\+\\d{7,15}"

  /** Adds `n_emails`/`n_ips`/`n_phones` (match counts on the original
    * text) and `clean_text` (all three pattern families replaced by
    * `<EMAIL>`/`<IP>`/`<PHONE>`).
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def count(pattern: String): Column =
      size(regexp_extract_all(t, lit(pattern), lit(0))).cast("long")
    docs
      .withColumn("n_emails", count(EmailPattern))
      .withColumn("n_ips", count(Ipv4Pattern))
      .withColumn("n_phones", count(PhonePattern))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))
  }

  def all: Seq[GraftQuery] = Seq(piiRedaction)

  /** The synthetic documents carry no PII, so the query plants a
    * deterministic email+email+IP+phone tail derived from `doc_id` on every
    * row — BOTH engines build the identical augmented text, Spark redacts
    * through [[redactPii]], and the oracle replays the same RE2-safe
    * patterns in DuckDB; md5 of the cleaned text proves the redaction
    * byte-for-byte.
    */
  val piiRedaction: GraftQuery = GraftQuery.sql(
    "q74_pii_redaction",
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
      |      '@example.com or admin' || CAST(doc_id AS VARCHAR) ||
      |      '@mail.example.org, ip 10.' || CAST(doc_id % 200 AS VARCHAR) ||
      |      '.0.7, tel +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') AS text
      |  FROM documents
      |), red AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |    len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |    len(regexp_extract_all(text, '\+\d{7,15}')) AS n_phones,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(text,
      |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\+\d{7,15}', '<PHONE>', 'g') AS clean
      |  FROM aug
      |)
      |SELECT doc_id,
      |  CAST(n_emails AS BIGINT) AS n_emails,
      |  CAST(n_ips AS BIGINT) AS n_ips,
      |  CAST(n_phones AS BIGINT) AS n_phones,
      |  CAST(len(clean) AS BIGINT) AS clean_len,
      |  md5(clean) AS clean_md5
      |FROM red
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val augmented = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com or admin"), col("doc_id").cast("string"),
        lit("@mail.example.org, ip 10."), (col("doc_id") % 200).cast("string"),
        lit(".0.7, tel +1555"),
        lpad((col("doc_id") % 10000).cast("string"), 7, "0")).as("text"))
    redactPii(augmented)
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        length(col("clean_text")).cast("long").as("clean_len"),
        md5(col("clean_text").cast("binary")).as("clean_md5"))
      .orderBy("doc_id")
  }
}
