package graft.operators

import graft.{Q, T}
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators beyond §2.K's dedup/similarity
  * rows: text canonicalization, deterministic stratified sampling, and
  * URL handling — the remaining plumbing of a C4/Gopher-style cleaning
  * pipeline, each a pure per-row projection (no shuffle until the sink)
  * so it scales linearly with input splits.
  */
object TrainingOps {

  /** Polynomial rolling hash of a string column, mod 1e9+7 (the same
    * cross-engine-exact construction as `text_fingerprint`: the fold
    * stays in 63-bit range — Spark wraps silently on overflow, DuckDB
    * errors, staying small keeps both exact).
    */
  private def fpSql(col: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($col) + 1), i -> CAST(ascii(substring($col, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 131 + c) % 1000000007)""".stripMargin

  private def fpSpark(c: String): org.apache.spark.sql.Column = expr(
    s"""aggregate(transform(sequence(1, length($c)), i -> CAST(ascii(substring($c, i, 1)) AS BIGINT)),
       |  0L, (acc, ch) -> (acc * 131 + ch) % 1000000007)""".stripMargin)

  val all: Seq[Q] = Seq(
    Q(
      "text_normalize",
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                           ' +', ' ', 'g')) AS norm_text,
        |       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                  ' +', ' ', 'g')))
        |         - length(replace(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                                              ' +', ' ', 'g')), ' ', '')) + 1 AS n_norm_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // C4-style canonicalization: casefold, strip non-alnum, collapse
      // whitespace. The normalized text is what exact/fuzzy dedup keys on —
      // run it once, reuse everywhere downstream.
      val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      T.documents(s, d)
        .withColumn("norm_text", norm)
        .select(col("doc_id"), col("norm_text"),
          (length(col("norm_text")) - length(regexp_replace(col("norm_text"), " ", "")) + 1)
            .as("n_norm_tokens"))
        .orderBy(col("doc_id"))
    },

    Q(
      "sample_stratified",
      s"""SELECT doc_id, lang, ${fpSql("text")} % 100 AS bucket
         |FROM documents
         |WHERE ${fpSql("text")} % 100 <
         |      CASE WHEN lang = 'en' THEN 20 ELSE 50 END
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // Deterministic stratified sampling: a content-hash bucket in [0,100)
      // with a per-stratum keep-rate (downsample the over-represented
      // language, keep more of the rest). Content-hash (not rand()) makes
      // the sample reproducible across runs, partitionings, and engines —
      // the property a 100 TB corpus rebuild needs. Pure projection+filter,
      // pushed to the scan.
      T.documents(s, d)
        .withColumn("bucket", fpSpark("text") % 100)
        .where(col("bucket") < when(col("lang") === "en", 20).otherwise(50))
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    },

    Q(
      "text_rarity",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |freq AS (
        |  SELECT t, count(*) AS f FROM tok GROUP BY t)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(CAST(sum(f) AS BIGINT) AS DOUBLE) / count(*) AS mean_tok_freq
        |FROM tok JOIN freq USING (t)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // Frequency-dictionary scoring — the cheap stand-in for LM-perplexity
      // quality filters: docs whose tokens are uniformly corpus-frequent
      // are boilerplate; rare-token-heavy docs are noise or treasure. The
      // pattern is the point at scale: pass 1 builds the corpus dictionary
      // (one narrow groupBy — O(vocab) result), pass 2 joins it back to
      // the token stream. The dictionary join is size-GATED (graft.Gate):
      // broadcast while the vocab fits the budget — the fact side never
      // shuffles — degrading to a shuffle join when raw-web token-type
      // counts blow past it. Scores stay in exact integer sums until one
      // final double division.
      val tok = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("f"))
      tok.join(graft.Gate.bcast(freq), "t")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
             (sum(col("f")).cast("double") / count(lit(1))).as("mean_tok_freq"))
        .orderBy(col("doc_id"))
    },

    Q(
      "text_url_extract",
      """SELECT doc_id,
        |       regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
        |       regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '\?(.*)$', 1) AS query,
        |       regexp_extract(url, '^[a-z]+://[a-z]+\.([a-z]+\.[a-z]+)', 1) AS domain
        |FROM (SELECT doc_id,
        |             'https://' || lang || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
        |               || '?ref=' || CAST(n_chars AS VARCHAR) AS url
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // URL parsing for provenance-based filtering/dedup (every web-scale
      // corpus pipeline groups by registered domain). Spark's native
      // parse_url is codegen'd; the synthetic URL column stands in for a
      // real crawl's metadata. The registrable-domain strip is the
      // cross-engine-checkable core of a public-suffix reduction.
      T.documents(s, d)
        .withColumn("url",
          concat(lit("https://"), col("lang"), lit(".example.com/docs/"),
                 col("doc_id").cast("string"), lit("?ref="), col("n_chars").cast("string")))
        .select(
          col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          regexp_extract(parse_url(col("url"), lit("HOST")), "^[a-z]+\\.([a-z]+\\.[a-z]+)", 1)
            .as("domain"))
        .orderBy(col("doc_id"))
    }
  )
}
