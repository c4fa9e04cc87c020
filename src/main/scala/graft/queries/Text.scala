package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis tier over the `documents` fixture (SURVEY.md §2.6
  * extension table): corpus stats, token counting, quality scoring,
  * language ID, fingerprinting. Every query is a pure composition of
  * codegen'd built-ins with an exact DuckDB mirror.
  */
object Text {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // shared DuckDB fragments live in DuckSql (one place, so Spark and SQL
  // can't drift); local aliases keep the query bodies readable
  private val duckWs = DuckSql.ws
  private val duckNonWs = DuckSql.nonWs
  private val duckTokens = DuckSql.tokens
  private val duckPunct = DuckSql.punct
  private def duckHits(langKey: String): String = DuckSql.hits(langKey)
  private val duckLangCase = DuckSql.langCase
  private val duckSubwords = DuckSql.subwords
  private val duckEmail = DuckSql.email
  private val duckIp = DuckSql.ip
  private val duckPhone = DuckSql.phone

  val entries: Seq[QueryDef] = Seq(

    // BPE-style pre-token counting beside the whitespace count — the
    // token-budget estimator an LLM-data pipeline actually needs
    // (whitespace counts "end." as one token; a BPE pretokenizer sees two)
    QueryDef.checked(
      "q59_subword_count",
      s"""SELECT lang,
         |  CAST(sum($duckSubwords) AS BIGINT) AS total_subwords,
         |  avg($duckSubwords) AS avg_subwords,
         |  CAST(sum($duckTokens) AS BIGINT) AS total_ws_tokens
         |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").groupBy(col("lang"))
        .agg(
          sum(subwordCount(col("text"))).as("total_subwords"),
          avg(subwordCount(col("text"))).as("avg_subwords"),
          sum(tokenCount(col("text"))).as("total_ws_tokens"))
    },

    // winnowed k-gram fingerprinting (the brief's "document fingerprinting
    // (rolling hash)" done as the standard winnowing scheme) — per-doc
    // distinct fingerprint counts, SQL-mirrored gram-for-gram
    QueryDef.checked(
      "q61_winnow_fingerprints",
      """SELECT doc_id, len(list_distinct(list_transform(
        |    range(1, greatest(len(kg) - 3, 1) + 1), j -> list_min(kg[j:j+3])))) AS n_fp
        |FROM (SELECT doc_id,
        |        list_transform(range(1, greatest(length(t) - 7, 1) + 1),
        |          i -> substring(md5(substring(t, i, 8)), 1, 8)) AS kg
        |      FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents))""".stripMargin) { (s, dir) =>
      // coalesce: on NULL text Spark's array_distinct would keep a null
      // fingerprint while DuckDB's list_distinct drops it — pin both
      // engines to the empty-string gram instead. The native expression
      // is bit-identical to winnow(kgramHashes(...)) (parity spec +
      // ScalaCheck) but one allocation-free pass instead of interpreted
      // HOFs (~3 s of the sf0.1 bench was per-window slice() garbage).
      t(s, dir, "documents")
        .withColumn("t", coalesce(col("text"), lit("")))
        .select(col("doc_id"),
          size(graft.functions.Md5WinnowFingerprints.of(col("t"), k = 8, w = 4))
            .cast("long").as("n_fp"))
    },

    QueryDef.checked(
      "q29_text_stats",
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  avg(n_chars) AS avg_chars,
         |  avg($duckTokens) AS avg_tokens
         |FROM documents GROUP BY lang, source""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          avg(col("n_chars")).as("avg_chars"),
          avg(tokenCount(col("text"))).as("avg_tokens"))
    },

    QueryDef.checked(
      "q30_token_quality",
      s"""SELECT doc_id,
         |  CAST($duckTokens AS BIGINT) AS n_tokens,
         |  $duckPunct AS punct_ratio,
         |  0.5 * least(1.0, $duckTokens / 50.0)
         |    + 0.25 * (1.0 - $duckPunct)
         |    + 0.25 * least(1.0, 5.0 * (CAST(${duckHits("en")} AS DOUBLE)
         |        / greatest($duckTokens, 1))) AS quality,
         |  md5(regexp_replace(lower(trim(text)), '$duckWs+', ' ', 'g')) AS fp
         |FROM documents""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        punctRatio(col("text")).as("punct_ratio"),
        qualityScore(col("text")).as("quality"),
        fingerprint(col("text")).as("fp"))
    },

    QueryDef.checked(
      "q31_lang_id",
      s"""WITH h AS (SELECT doc_id, lang,
         |    ${duckHits("en")} AS he, ${duckHits("de")} AS hd,
         |    ${duckHits("fr")} AS hf, ${duckHits("es")} AS hs
         |  FROM documents)
         |SELECT doc_id, $duckLangCase AS pred_lang,
         |  ($duckLangCase) = lang AS agrees
         |FROM h""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        langId(col("text")).as("pred_lang"),
        (langId(col("text")) === col("lang")).as("agrees"))
    },

    // data-quality profile as DATA (the Quality operator's standalone
    // form): one row per named check with its violation count — the
    // corpus-intake health report a training pipeline runs before
    // admitting a crawl batch. The oracle recomputes each predicate in
    // SQL, so the check semantics (null handling included) are pinned
    // cross-engine.
    QueryDef.checked(
      "q65_quality_profile",
      """SELECT 'lang_code' AS check_name,
        |  count(*) FILTER (WHERE lang IS NULL
        |    OR NOT regexp_matches(lang, '^[a-z][a-z]$')) AS violations,
        |  count(*) AS n_rows FROM documents
        |UNION ALL
        |SELECT 'text_min_len',
        |  count(*) FILTER (WHERE length(text) IS NULL OR length(text) < 100
        |    OR length(text) > 1000000), count(*) FROM documents
        |UNION ALL
        |SELECT 'text_not_null',
        |  count(*) FILTER (WHERE text IS NULL), count(*) FROM documents""".stripMargin) { (s, dir) =>
      import graft.operators.Quality
      Quality.profile(t(s, dir, "documents"), Seq(
        Quality.Check("lang_code",
          col("lang").isNull || !col("lang").rlike("^[a-z][a-z]$")),
        Quality.Check.inRange(length(col("text")), 100, 1000000, "text_min_len"),
        Quality.Check.notNull(col("text"), "text_not_null")))
    },

    // training-mix assembly: admit documents per language, in doc_id
    // order, until each language's 5000-token budget is exhausted
    // (CorpusMix.takeUntilBudget — one window pass, reproducible mix).
    // The oracle replays the running-sum admission in SQL, so the cutoff
    // semantics (whole documents only, first-over-budget dropped) are
    // pinned cross-engine.
    QueryDef.checked(
      "q66_token_budget_mix",
      s"""WITH d AS (SELECT lang, doc_id, $duckTokens AS toks FROM documents),
         |c AS (SELECT lang, toks,
         |    sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d)
         |SELECT lang, count(*) AS n_kept, CAST(sum(toks) AS BIGINT) AS kept_tokens
         |FROM c WHERE cum <= 5000 GROUP BY lang""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"), tokenCount(col("text")).as("toks"))
      graft.operators.CorpusMix
        .takeUntilBudget(d, Seq(col("lang")), col("doc_id"), col("toks"), 5000)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("toks").as("kept_tokens"))
    },

    // deterministic content-keyed sampling + split assignment
    // (Sampling.stratifiedSample / assignSplit): admission is a pure
    // function of md5(doc_id) compared against fixed-width hex
    // thresholds, so the oracle replays the EXACT same decisions in SQL —
    // stable across cluster sizes and repartitioning, unlike df.sample().
    // en is kept at 50%, other languages at 20%; the kept set splits
    // 80/10/10 under an independently salted hash.
    QueryDef.checked(
      "q69_stratified_sample",
      """WITH h AS (
        |  SELECT lang,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS ha,
        |    substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8) AS hs
        |  FROM documents),
        |a AS (SELECT lang, hs FROM h
        |      WHERE ha < CASE WHEN lang = 'en' THEN '80000000' ELSE '33333333' END)
        |SELECT lang,
        |  CASE WHEN hs < 'cccccccc' THEN 'train'
        |       WHEN hs < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM a GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val sampled = graft.operators.Sampling.stratifiedSample(
        t(s, dir, "documents"), col("lang"), col("doc_id"),
        Map("en" -> 0.5), default = 0.2)
      graft.operators.Sampling
        .assignSplit(sampled, col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
    },

    // WEIGHTED deterministic sampling (Sampling.weightedSample): each doc
    // is kept with probability n_chars/4000 (capped at 1) — the
    // length-proportional downsampling used to bias a quick-look corpus
    // toward substantive documents. The uniform draw is a 52-bit md5
    // integer and the acceptance bound floor(p·2^52), so the per-row
    // decision is an integer compare the oracle replays EXACTLY (no
    // transcendental ranking — an Efraimidis-Spirakis top-k would hinge
    // on pow/log ulps that differ across libm implementations).
    QueryDef.checked(
      "q111_weighted_sample",
      """SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE CAST(concat('0x',
        |        substring(md5(CAST(doc_id AS VARCHAR) || 'wsample'), 1, 13))
        |      AS BIGINT)
        |    < CAST(floor(least(n_chars / 4000.0, 1.0) * 4503599627370496.0)
        |      AS BIGINT)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.operators.Sampling.weightedSample(
        t(s, dir, "documents"), col("doc_id"), col("n_chars") / 4000.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    },

    // repetition quality gates (the Gopher/C4 junk filters): duplicate-word
    // fraction per row + the share of bigrams claimed by the most frequent
    // bigram (Repetition.profile — explode + lead window + two-level agg,
    // linear in corpus tokens). The oracle recomputes both signals and the
    // keep decision, pinning the filter semantics cross-engine.
    QueryDef.checked(
      "q70_repetition_filter",
      s"""WITH w AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '$duckWs+') AS ws FROM documents),
         |d AS (SELECT doc_id,
         |    1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1)
         |      AS dup_word_frac FROM w),
         |p AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |      FROM w WHERE len(ws) >= 2),
         |g AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS ng FROM p),
         |c AS (SELECT doc_id, ng, count(*) AS cnt FROM g GROUP BY 1, 2),
         |m AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_grams
         |      FROM c GROUP BY 1)
         |SELECT d.doc_id, d.dup_word_frac,
         |  COALESCE(CAST(m.top_cnt AS DOUBLE) / m.n_grams, 0.0) AS top_bigram_frac,
         |  d.dup_word_frac <= 0.3
         |    AND COALESCE(CAST(m.top_cnt AS DOUBLE) / m.n_grams, 0.0) <= 0.2 AS kept
         |FROM d LEFT JOIN m USING (doc_id)""".stripMargin) { (s, dir) =>
      graft.operators.Repetition.profile(t(s, dir, "documents"), n = 2)
        .select(col("doc_id"), col("dup_word_frac"),
          col("top_ngram_frac").as("top_bigram_frac"),
          (col("dup_word_frac") <= 0.3 && col("top_ngram_frac") <= 0.2).as("kept"))
    },

    // PII redaction (the C4-style scrubbing pass): emails/IPv4s/+phones →
    // typed mask tokens. The fixture text carries no PII, so each doc gets
    // a deterministic synthetic contact line appended IN BOTH ENGINES; the
    // oracle replays the same stepwise redaction and hashes the clean
    // text — a hash match pins pattern semantics, replacement order, and
    // span counting cross-engine.
    QueryDef.checked(
      "q71_pii_redaction",
      s"""WITH a AS (SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com or +4930' || doc_id
         |         || ' at 10.0.' || (doc_id % 200) || '.1' AS t
         |  FROM documents),
         |r1 AS (SELECT doc_id, t,
         |    len(regexp_extract_all(t, '$duckEmail')) AS ne,
         |    regexp_replace(t, '$duckEmail', '[EMAIL]', 'g') AS t1 FROM a),
         |r2 AS (SELECT doc_id, ne, t1,
         |    len(regexp_extract_all(t1, '$duckIp')) AS ni,
         |    regexp_replace(t1, '$duckIp', '[IP]', 'g') AS t2 FROM r1),
         |r3 AS (SELECT doc_id, ne, ni,
         |    len(regexp_extract_all(t2, '$duckPhone')) AS np,
         |    regexp_replace(t2, '$duckPhone', '[PHONE]', 'g') AS t3 FROM r2)
         |SELECT doc_id, CAST(ne + ni + np AS BIGINT) AS n_pii, md5(t3) AS clean_hash
         |FROM r3""".stripMargin) { (s, dir) =>
      val aug = t(s, dir, "documents").withColumn("t",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +4930"), col("doc_id"),
          lit(" at 10.0."), pmod(col("doc_id"), lit(200)), lit(".1")))
      aug.select(col("doc_id"),
        piiCount(col("t")).as("n_pii"),
        md5(redactPii(col("t"))).as("clean_hash"))
    },

    // tokenizer-style vocabulary: deterministic top-500 by (count desc,
    // token asc) with 1-based ids — the reproducible-retrain contract.
    // Plan shape is distributed TopK (orderBy+limit), with only the
    // bounded vocabulary passing the id window.
    QueryDef.checked(
      "q73_vocabulary",
      s"""WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '$duckWs+')) AS tok
         |           FROM documents),
         |c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
         |v AS (SELECT tok, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, tok) AS id FROM c)
         |SELECT id, tok, cnt FROM v WHERE id <= 500""".stripMargin) { (s, dir) =>
      graft.operators.Vocabulary.build(t(s, dir, "documents"), size = 500)
    },

    // unigram surprisal quality gate: each doc's average -ln p(word) under
    // the corpus' own unigram distribution (the cheap perplexity proxy;
    // both tails are junk). Rounded to 6 decimals in BOTH engines — the
    // one transcendental in the oracle suite, pinned by rounding.
    QueryDef.checked(
      "q74_unigram_surprisal",
      s"""WITH w AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '$duckWs+')) AS tok
         |  FROM documents),
         |f AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
         |t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM f)
         |SELECT w.doc_id, count(*) AS n_toks,
         |  round(avg(-ln(f.cnt / t.n)), 6) AS avg_surprisal
         |FROM w JOIN f USING (tok), t
         |GROUP BY w.doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Vocabulary.surprisal(t(s, dir, "documents"))
    },

    // character-class (script) profile — the multilingual-curation
    // counterpart of langId: per-doc fractions of latin letters, digits,
    // whitespace, sentence punctuation, and everything else, counted by
    // replace-delta (one codegen'd regexp per class, no explode). The
    // five fractions partition the text exactly; `mostly_latin` is the
    // script-routing flag.
    QueryDef.checked(
      "q96_script_profile", {
        def cnt(cls: String) =
          s"length(text) - length(regexp_replace(text, '$cls', '', 'g'))"
        s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           |  round(CAST(${cnt("[A-Za-z]")} AS DOUBLE) / greatest(length(text), 1), 6) AS latin_frac,
           |  round(CAST(${cnt("[0-9]")} AS DOUBLE) / greatest(length(text), 1), 6) AS digit_frac,
           |  round(CAST(${cnt(DuckSql.ws)} AS DOUBLE) / greatest(length(text), 1), 6) AS space_frac,
           |  round(CAST(${cnt("[.!?,;:]")} AS DOUBLE) / greatest(length(text), 1), 6) AS punct_frac,
           |  round(CAST(${cnt("""[^A-Za-z0-9.!?,;: \t\n\x0B\f\r]""")} AS DOUBLE)
           |    / greatest(length(text), 1), 6) AS other_frac,
           |  CAST(${cnt("[A-Za-z]")} AS DOUBLE) / greatest(length(text), 1) > 0.5 AS mostly_latin
           |FROM documents""".stripMargin
      }) { (s, dir) =>
      val len = greatest(length(col("text")), lit(1)).cast("double")
      def frac(cls: String) =
        round((length(col("text")) -
          length(regexp_replace(col("text"), cls, ""))).cast("double") / len, 6)
      t(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        frac("[A-Za-z]").as("latin_frac"),
        frac("[0-9]").as("digit_frac"),
        frac(WS).as("space_frac"),
        frac("[.!?,;:]").as("punct_frac"),
        frac("[^A-Za-z0-9.!?,;: \t\n\f\r]").as("other_frac"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "[A-Za-z]", ""))).cast("double") / len > 0.5)
          .as("mostly_latin"))
    },

    // model-based quality scoring (QualityModel): the linear
    // hashed-bag-of-words scorer — mean model weight over word
    // occurrences, md5-hex feature buckets, OOV mass via a default
    // weight. The "model" here is a deterministic synthetic weight
    // table over the full 4096-bucket space (weights normally arrive
    // from offline training as data); both engines derive it from the
    // same closed form, so the oracle replays the entire scoring
    // decision including the keep flag at score > 0.
    QueryDef.checked(
      "q122_quality_model",
      s"""WITH wts AS (
         |  SELECT printf('%03x', i) AS bucket, (i % 197) / 197.0 - 0.5 AS weight
         |  FROM generate_series(0, 4095) t(i)
         |), occ AS (
         |  SELECT doc_id, substring(md5(w), 1, 3) AS bucket
         |  FROM (SELECT doc_id,
         |          unnest(regexp_split_to_array(trim(text), '${DuckSql.ws}+')) AS w
         |        FROM documents)
         |  WHERE length(w) > 0
         |)
         |SELECT doc_id, count(*) AS n_words,
         |  round(avg(coalesce(weight, 0.0)), 6) AS score,
         |  round(avg(coalesce(weight, 0.0)), 6) > 0 AS keep
         |FROM occ LEFT JOIN wts USING (bucket)
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      val weights = s.range(4096).select(
        format_string("%03x", col("id")).as("bucket"),
        (col("id") % 197) / 197.0 - 0.5).toDF("bucket", "weight")
      graft.operators.QualityModel.score(t(s, dir, "documents"), weights)
        .withColumn("keep", col("score") > 0)
    },

    // overlapping-window chunking (Chunker): long docs split into
    // 64-token windows every 48 tokens (16 tokens of shared context),
    // tail emitted once, never redundantly. Fully map-side — no shuffle
    // at all — and the oracle hash-matches the chunk TEXT itself (md5),
    // pinning tokenization, window starts, slicing, and rejoining.
    QueryDef.checked(
      "q123_chunk_windows",
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS l
         |  FROM documents WHERE length(trim(text)) > 0
         |), s AS (
         |  SELECT doc_id, l, len(l) AS n,
         |    unnest(generate_series(1, greatest(least(len(l), len(l) - 64 + 48), 1), 48)) AS st
         |  FROM t
         |)
         |SELECT doc_id, CAST((st - 1) // 48 AS BIGINT) AS chunk_idx,
         |  CAST(len(l[st:least(st + 63, n)]) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(l[st:least(st + 63, n)], ' ')) AS chunk_md5
         |FROM s""".stripMargin) { (s, dir) =>
      graft.operators.Chunker.slidingChunks(t(s, dir, "documents"), size = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
    }
  )
}
