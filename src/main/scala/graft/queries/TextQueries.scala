package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (SURVEY.md §7.4): language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions — one narrow pass per document, shuffle only for the final
  * summaries — and every formula is mirrored exactly in the DuckDB oracle
  * (integer counts + IEEE double ratios, so results match bit-for-bit).
  *
  * Note: the synthetic corpus draws every document from one shared English
  * vocabulary regardless of its `lang` tag, so the language-ID heuristic is
  * validated as a deterministic formula (oracle), not against the tag.
  */
object TextQueries {

  /** Marker-stopword sets per language (the n-gram-heuristic shape real
    * langid uses; tiny on purpose). */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "(the|a|of|and)",
    "de" -> "(der|und|das|die)",
    "fr" -> "(le|et|les|des)",
    "es" -> "(el|y|los|las)")

  private def score(pat: String): Column =
    regexp_count(col("text"), lit("\\b" + pat + "\\b"))

  val defs: Seq[QueryDef] = Seq(

    // Language ID: marker-word scores + CJK-codepoint check, deterministic
    // priority argmax.
    QueryDef.sql(
      "q60_lang_id",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(the|a|of|and)\b'))  AS s_en,
        |  len(regexp_extract_all(text, '\b(der|und|das|die)\b')) AS s_de,
        |  len(regexp_extract_all(text, '\b(le|et|les|des)\b'))  AS s_fr,
        |  len(regexp_extract_all(text, '\b(el|y|los|las)\b'))   AS s_es,
        |  CASE
        |    WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(le|et|les|des)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(el|y|los|las)\b')) = 0 THEN 'unknown'
        |    WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(der|und|das|die)\b'))
        |     AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |     AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'en'
        |    WHEN len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |     AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'de'
        |    WHEN len(regexp_extract_all(text, '\b(le|et|les|des)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'fr'
        |    ELSE 'es' END AS predicted
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val Seq(en, de, fr, es) = markers.map { case (_, p) => score(p) }
      val zh = regexp_count(col("text"), lit("[一-鿿]"))
      t(s, d, "documents").select(
        col("doc_id"),
        en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"),
        when(zh > 0, "zh")
          .when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
          .when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es").as("predicted"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/punctuation/stopword ratios composed into one
    // [0,1] score — the pre-training filter shape.
    QueryDef.sql(
      "q61_quality_score",
      """SELECT doc_id,
        |  length(text) AS n_chars_m,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
        |  round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE
        |        / length(text), 6) AS punct_ratio,
        |  round(len(regexp_extract_all(text, '\b(the|a|of|and)\b'))::DOUBLE
        |        / len(regexp_extract_all(text, '[a-z]+')), 6) AS stopword_ratio,
        |  round(0.5 * least(len(regexp_extract_all(text, '[a-z]+')) / 120.0, 1.0)
        |      + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
        |      + 0.2 * least(4 * len(regexp_extract_all(text, '\b(the|a|of|and)\b'))::DOUBLE
        |                    / len(regexp_extract_all(text, '[a-z]+')), 1.0), 6) AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nWords = regexp_count(col("text"), lit("[a-z]+"))
      val nPunct = regexp_count(col("text"), lit("[^a-z0-9 ]"))
      val nStop = regexp_count(col("text"), lit("\\b(the|a|of|and)\\b"))
      val nChars = length(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        nChars.as("n_chars_m"),
        nWords.as("n_words"),
        round(nPunct.cast("double") / nChars, 6).as("punct_ratio"),
        round(nStop.cast("double") / nWords, 6).as("stopword_ratio"),
        round(lit(0.5) * least(nWords / 120.0, lit(1.0))
          + lit(0.3) * (lit(1.0) - nPunct.cast("double") / nChars)
          + lit(0.2) * least(lit(4) * nStop.cast("double") / nWords, lit(1.0)), 6)
          .as("quality"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (alpha runs / digit runs / single punctuation), summed per source —
    // exact integer aggregation.
    QueryDef.sql(
      "q62_token_count",
      """SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(regexp_count(col("text"), lit("\\S+"))).as("ws_tokens"),
          sum(regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")))
            .as("bpe_tokens"),
          sum(length(col("text"))).as("total_chars"))
        .orderBy("source")
    },

    // Document fingerprinting: 32-bit-masked polynomial rolling hash over the
    // character stream — overflow-free in ANSI mode, identical fold in both
    // engines (DuckDB list_reduce is a left fold with the first element as
    // init, hence the prepended seed).
    QueryDef.sql(
      "q63_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      list_transform(generate_series(1, length(text)),
        |                     i -> ascii(substring(text, i, 1))::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) & 4294967295) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val chars = transform(
        sequence(lit(1), length(col("text"))),
        i => ascii(col("text").substr(i, lit(1))).cast("long"))
      t(s, d, "documents").select(
        col("doc_id"),
        aggregate(chars, lit(7L),
          (acc, c) => (acc * 31 + c).bitwiseAND(lit(4294967295L))).as("fp"))
        .orderBy("doc_id")
    },

    // PII redaction — the scrub pass every public-web training corpus
    // runs before release. The synthetic corpus carries no PII, so it is
    // INJECTED deterministically (every 5th doc gains an email + a phone
    // number — the same make-it-non-vacuous discipline as q90/q128), then
    // scrubbed with the classic pattern pass: emails and phone numbers
    // collapse to typed placeholders. Patterns stay in the Java-regex ∩
    // RE2 common subset (character classes, +, {n} — no lookaround), so
    // both engines match identically; the md5 of the redacted text pins
    // the full output byte-for-byte. 100 TB shape: pure narrow per-row
    // regex work, zero shuffle before the presentation sort, and the scan
    // reads only (doc_id, text).
    QueryDef.sql(
      "q151_pii_redact",
      """WITH injected AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |                   || '@example.com or call 555-'
        |                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE text END AS text
        |  FROM documents),
        |scrubbed AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_emails,
        |         len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
        |         regexp_replace(regexp_replace(text,
        |           '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |           '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM injected)
        |SELECT doc_id, n_emails, n_phones,
        |       length(redacted) AS n_chars_redacted,
        |       md5(redacted) AS redacted_md5
        |FROM scrubbed
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val injected = t(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com or call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")).as("text"))
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "555-[0-9]{4}"
      injected.select(col("doc_id"),
          regexp_count(col("text"), lit(emailRe)).as("n_emails"),
          regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
          regexp_replace(regexp_replace(col("text"),
            emailRe, "<EMAIL>"), phoneRe, "<PHONE>").as("redacted"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).as("n_chars_redacted"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")
    }
  )
}
