package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM-pipeline data prep, over `documents`
  * (reference analogue: the scraped social/web text the agent ingests —
  * backend/src/api/services/db_service.py ingest_data / scrapers).
  *
  * Everything is built from codegen'd built-ins (split/filter/md5/regexp) —
  * no UDFs — so whole-stage codegen covers the full pipeline and the same
  * logic is expressible in the DuckDB oracle.
  */
object TextOps {

  /** 60-bit hash from md5 — the one hash function both engines share. */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def wordsCol: Column = split(lower(col("text")), " ")

  // T1 — marker-word language ID (n-gram heuristic): hit counts per
  // language's stopword set, argmax with a fixed tie-break order.
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hits(ws: String*) : Column =
      size(filter(wordsCol, w => w.isInCollection(ws))).cast("long")
    Tables.documents(s, dir)
      .withColumn("en_hits", hits("the", "a", "of"))
      .withColumn("de_hits", hits("der", "die", "und"))
      .withColumn("fr_hits", hits("le", "la", "et"))
      .withColumn("pred_lang",
        when($"en_hits" >= $"de_hits" && $"en_hits" >= $"fr_hits" && $"en_hits" > 0, "en")
          .when($"de_hits" >= $"fr_hits" && $"de_hits" > 0, "de")
          .when($"fr_hits" > 0, "fr")
          .otherwise("und"))
      .select($"doc_id", $"en_hits", $"de_hits", $"fr_hits", $"pred_lang", $"lang")
      .orderBy($"doc_id")
  }

  // T2 — quality scoring: length / punctuation / stopword ratios.
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("len_chars", length($"text").cast("long"))
      .withColumn("n_words", size(wordsCol).cast("long"))
      .withColumn("n_punct",
        length(regexp_replace($"text", "[^.,;:!?]", "")).cast("long"))
      .withColumn("stop_hits",
        size(filter(wordsCol, w => w.isInCollection(Seq("the", "a", "of", "and")))).cast("long"))
      .withColumn("quality",
        round($"stop_hits".cast("double") / $"n_words"
          - $"n_punct".cast("double") / $"len_chars"
          + least(lit(1.0), $"n_words".cast("double") / 100.0), 4))
      .select($"doc_id", $"len_chars", $"n_words", $"n_punct", $"stop_hits", $"quality")
      .orderBy($"doc_id")
  }

  // T3 — token counting: whitespace tokens + a BPE-ish regex tokenizer
  // (letter runs / single digits / single punctuation = disjoint classes,
  // so Java-regex and RE2 agree).
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("ws_tokens", size(split(trim($"text"), " +")).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long"))
      .select($"doc_id", $"ws_tokens", $"bpe_tokens")
      .orderBy($"doc_id")
  }

  // T4 — document fingerprint: canonicalize (lowercase, distinct words,
  // sorted) then hash — robust to word order / repetition.
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("fp", md5(concat_ws(" ", array_sort(array_distinct(wordsCol)))))
      .select($"doc_id", $"fp")
      .orderBy($"doc_id")
  }
}
