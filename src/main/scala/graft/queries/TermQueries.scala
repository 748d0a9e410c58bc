package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.graftx.GraftExtensions

/** Tokenize/explode term analytics and lexicon joins (SURVEY.md §7.4 "text
  * analysis": tf counts, lexicon sentiment join), plus the SQL face of the
  * native expressions. Exact integer arithmetic — every query oracle-checked.
  */
object TermQueries {

  /** Tiny sentiment lexicon, defined identically in the oracle's VALUES. */
  private val lexicon: Seq[(String, Int)] = Seq(
    "fast" -> 2, "slow" -> -2, "big" -> 1, "small" -> -1, "merge" -> 1,
    "error" -> -2, "value" -> 1)

  val defs: Seq[QueryDef] = Seq(

    // Term stats: explode words, per-(lang, word) document frequency and
    // occurrence count, top-5 words per lang by df. The explode→agg shape is
    // the map side of every tf/idf pipeline; exact ints.
    QueryDef.sql(
      "q67_term_stats",
      """WITH tokens AS (
        |  SELECT lang, doc_id, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |     stats AS (
        |  SELECT lang, word,
        |         count(DISTINCT doc_id) AS df,
        |         count(*) AS tf
        |  FROM tokens WHERE word <> '' GROUP BY lang, word),
        |     ranked AS (
        |  SELECT lang, word, df, tf,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY df DESC, tf DESC, word) AS rn
        |  FROM stats)
        |SELECT lang, rn, word, df, tf FROM ranked WHERE rn <= 5
        |ORDER BY lang, rn""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tokens = t(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val stats = tokens.groupBy("lang", "word")
        .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf"))
      val w = Window.partitionBy("lang")
        .orderBy(col("df").desc, col("tf").desc, col("word"))
      stats.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("lang", "rn", "word", "df", "tf")
        .orderBy("lang", "rn")
    },

    // Lexicon sentiment join: explode words, broadcast-join the scored
    // lexicon, per-document additive score — the EDBT-style lexicon join
    // with a bounded broadcast dim.
    QueryDef.sql(
      "q68_lexicon_sentiment",
      """WITH lex(word, score) AS (VALUES
        |  ('fast', 2), ('slow', -2), ('big', 1), ('small', -1),
        |  ('merge', 1), ('error', -2), ('value', 1)),
        |     tokens AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents)
        |SELECT t.doc_id,
        |       CAST(sum(lex.score) AS BIGINT) AS sentiment,
        |       count(*) AS n_scored
        |FROM tokens t JOIN lex ON t.word = lex.word
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val lex = lexicon.toDF("word", "score")
      val tokens = t(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      tokens.join(broadcast(lex), Seq("word"))
        .groupBy("doc_id")
        .agg(sum("score").cast("long").as("sentiment"),
          count(lit(1)).as("n_scored"))
        .orderBy("doc_id")
    },

    // The native expressions through the SQL front end (GraftExtensions):
    // the user-facing `SELECT cosine_similarity(...)` surface, oracled
    // against DuckDB's built-in.
    QueryDef.sql(
      "q53_sql_cosine",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(CAST(list_cosine_similarity(a.embedding, b.embedding)
        |                  AS DOUBLE), 4) AS score
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 50
        |ORDER BY id_a""".stripMargin) { (s, d) =>
      GraftExtensions.register(s)
      Tables.registerAll(s, d)
      s.sql(
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |       round(cosine_similarity(a.embedding, b.embedding), 4) AS score
          |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
          |WHERE a.vec_id < 50
          |ORDER BY id_a""".stripMargin)
    }
  )
}
