package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation tier: benchmark decontamination, line-level
  * boilerplate removal, BM25 retrieval, and sequence packing — the late
  * pipeline stages between "deduplicated corpus" and "training shards".
  * Every query has an exact DuckDB mirror.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private val duckWs = """[ \t\n\x0B\f\r]"""
  private val duckNonWs = """[^ \t\n\x0B\f\r]"""

  val entries: Seq[QueryDef] = Seq(

    // benchmark decontamination: docs with doc_id % 10 = 0 stand in for
    // an eval set; any remaining (train) doc sharing >5% of its distinct
    // word 8-grams with the eval set is flagged. The oracle replays the
    // gram construction, the distinct, and the overlap join, so the
    // contamination decision is pinned cross-engine. The fixture's
    // near-duplicate docs make the flag land on real leaks.
    QueryDef.checked(
      "q77_decontaminate",
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '$duckWs+') AS l FROM documents),
         |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i
         |      FROM t WHERE len(l) >= 8),
         |g AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+7], ' ') AS g FROM p),
         |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
         |tg AS (SELECT * FROM g WHERE doc_id % 10 <> 0),
         |o AS (SELECT tg.doc_id, count(*) AS n_grams, count(eg.g) AS n_overlap
         |      FROM tg LEFT JOIN eg ON tg.g = eg.g GROUP BY tg.doc_id)
         |SELECT doc_id, n_grams, n_overlap,
         |  CAST(n_overlap AS DOUBLE) / n_grams AS overlap_frac,
         |  CAST(n_overlap AS DOUBLE) / n_grams > 0.05 AS contaminated
         |FROM o""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.overlap(
        train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        eval = docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        n = 8, threshold = 0.05)
    },

    // line-level boilerplate removal (CCNet-style): the fixture text is
    // single-line, so each doc gets the same deterministic 3-line layout
    // in BOTH engines — body, a shared footer (boilerplate in every doc),
    // and a per-doc unique line. The cleaned text is hashed; a hash match
    // pins line splitting, the >=2-docs removal rule, and order-preserving
    // reassembly cross-engine.
    QueryDef.checked(
      "q78_line_dedup",
      """WITH a AS (SELECT doc_id,
        |    text || chr(10) || 'shared footer line' || chr(10) || 'doc ' || doc_id AS t
        |  FROM documents),
        |s AS (SELECT doc_id, split(t, chr(10)) AS ls FROM a),
        |p AS (SELECT doc_id, ls[i] AS line, i AS pos FROM
        |      (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM s)),
        |c AS (SELECT line, count(DISTINCT doc_id) AS nd FROM p GROUP BY line),
        |k AS (SELECT p.doc_id, p.pos, p.line, c.nd FROM p JOIN c USING (line)),
        |agg AS (SELECT doc_id,
        |    count(*) AS n_lines,
        |    count(*) FILTER (WHERE nd >= 2) AS n_removed,
        |    string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE nd < 2) AS cleaned
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_removed, md5(COALESCE(cleaned, '')) AS clean_hash
        |FROM agg""".stripMargin) { (s, dir) =>
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\nshared footer line\ndoc "), col("doc_id")).as("text"))
      graft.operators.LineDedup.clean(aug, minDocs = 2)
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("cleaned")).as("clean_hash"))
    },

    // BM25 top-20 for a fixed query over corpus vocabulary. Scores are
    // rounded to 6 decimals BEFORE ranking in both engines (the q74
    // transcendental-oracle discipline), ties break by doc_id.
    QueryDef.checked(
      "q79_bm25",
      s"""WITH w AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '$duckWs+')) AS tok FROM documents),
         |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
         |g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |q AS (SELECT unnest(['spark', 'merge', 'vector']) AS term),
         |tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM w
         |       JOIN q ON w.tok = q.term GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |    sum(ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |        * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / g.avgdl))) AS s
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), g GROUP BY tf.doc_id),
         |r AS (SELECT doc_id, round(s, 6) AS score FROM sc)
         |SELECT doc_id, score, rank FROM
         |  (SELECT doc_id, score,
         |     row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM r)
         |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      graft.operators.Bm25.topDocs(t(s, dir, "documents"),
        terms = Seq("spark", "merge", "vector"), topK = 20)
    },

    // concat-and-chunk sequence packing: every doc's global token offset
    // (exclusive prefix sum in doc_id order) and its span of 512-token
    // training chunks. The oracle computes the prefix sum with a plain
    // global window; the engine uses the distributed scan
    // (Packing.exclusivePrefixSum) — same numbers, no one-reducer stage.
    QueryDef.checked(
      "q80_pack_chunks",
      s"""WITH d AS (SELECT doc_id,
         |    len(regexp_extract_all(text, '$duckNonWs+')) AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    COALESCE(sum(toks) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM d WHERE toks > 0)
         |SELECT doc_id, CAST(toks AS BIGINT) AS toks, CAST(off AS BIGINT) AS offset,
         |  CAST(off // 512 AS BIGINT) AS first_chunk,
         |  CAST((off + toks - 1) // 512 AS BIGINT) AS last_chunk,
         |  CAST((off + toks - 1) // 512 - off // 512 + 1 AS BIGINT) AS n_chunks
         |FROM c""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("toks"))
        .filter(col("toks") > 0)
      graft.operators.Packing.chunkSpans(d, ctxLen = 512,
        orderCol = col("doc_id"), tokensCol = col("toks"))
    },

    // the composite filter-decision table (FilterPipeline.decide): every
    // quality signal as a column plus keep/drop with the FIRST failing
    // gate as the reason code — the "attribute store" a pipeline
    // materializes so threshold changes replay without recomputing
    // signals. The oracle rebuilds every signal and the gate cascade, so
    // signal semantics AND gate order are pinned cross-engine.
    QueryDef.checked(
      "q81_filter_decisions",
      s"""WITH base AS (SELECT doc_id, text,
         |    ${DuckSql.tokens} AS n_tokens, round(${DuckSql.quality}, 6) AS quality,
         |    ${DuckSql.hits("en")} AS he, ${DuckSql.hits("de")} AS hd,
         |    ${DuckSql.hits("fr")} AS hf, ${DuckSql.hits("es")} AS hs
         |  FROM documents),
         |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS wsa
         |      FROM documents),
         |d AS (SELECT doc_id, 1.0 - CAST(len(list_distinct(wsa)) AS DOUBLE)
         |        / greatest(len(wsa), 1) AS dup_word_frac FROM w),
         |p AS (SELECT doc_id, wsa, unnest(generate_series(1, len(wsa) - 1)) AS i
         |      FROM w WHERE len(wsa) >= 2),
         |g AS (SELECT doc_id, wsa[i] || ' ' || wsa[i + 1] AS ng FROM p),
         |c AS (SELECT doc_id, ng, count(*) AS cnt FROM g GROUP BY 1, 2),
         |m AS (SELECT doc_id, max(cnt) AS tc, sum(cnt) AS ngr FROM c GROUP BY 1),
         |attrs AS (SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |    ${DuckSql.langCase} AS pred_lang, b.quality,
         |    d.dup_word_frac,
         |    COALESCE(CAST(m.tc AS DOUBLE) / m.ngr, 0.0) AS top_bigram_frac
         |  FROM base b JOIN d USING (doc_id) LEFT JOIN m USING (doc_id)),
         |r AS (SELECT *,
         |    CASE WHEN n_tokens < 20 THEN 'too_short'
         |         WHEN n_tokens > 5000 THEN 'too_long'
         |         WHEN pred_lang = 'und' THEN 'no_lang'
         |         WHEN dup_word_frac > 0.55 THEN 'repetitive_words'
         |         WHEN top_bigram_frac > 0.1 THEN 'repetitive_ngrams'
         |         WHEN quality < 0.55 THEN 'low_quality'
         |         ELSE 'kept' END AS reason
         |  FROM attrs)
         |SELECT doc_id, n_tokens, pred_lang, quality, dup_word_frac,
         |  top_bigram_frac, reason, reason = 'kept' AS kept
         |FROM r""".stripMargin) { (s, dir) =>
      graft.operators.FilterPipeline.decide(t(s, dir, "documents"))
    },

    // tokenizer application at corpus scale: encode every doc under the
    // deterministic top-500 vocabulary (q73's), 0 = OOV, ids reassembled
    // in position order and hashed. A hash match pins the vocabulary tie
    // order, the token→id map, OOV handling, AND order preservation.
    QueryDef.checked(
      "q82_vocab_encode",
      s"""WITH wc AS (SELECT unnest(regexp_split_to_array(trim(text), '${DuckSql.ws}+')) AS tok
         |            FROM documents),
         |c AS (SELECT tok, count(*) AS cnt FROM wc GROUP BY tok),
         |v AS (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS id FROM c),
         |vv AS (SELECT tok, id FROM v WHERE id <= 500),
         |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS l
         |      FROM documents),
         |p AS (SELECT doc_id, l[i] AS tok, i AS pos FROM
         |      (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM t)),
         |j AS (SELECT p.doc_id, p.pos, COALESCE(vv.id, 0) AS tid
         |      FROM p LEFT JOIN vv USING (tok)),
         |agg AS (SELECT doc_id, count(*) AS n_tokens,
         |    count(*) FILTER (WHERE tid = 0) AS n_oov,
         |    string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS ids
         |  FROM j GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_oov,
         |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate, md5(ids) AS ids_hash
         |FROM agg""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.operators.Vocabulary
        .encode(docs, graft.operators.Vocabulary.build(docs, size = 500))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_rate"),
          md5(col("ids")).as("ids_hash"))
    },

    // shuffle-then-pack: the training-order step — docs are globally
    // shuffled by a DETERMINISTIC key (md5 of the id, reproducible across
    // runs and cluster sizes, unlike orderBy(rand())) and packed into 512-
    // token chunks in that order. Same distributed scan as q80; the range
    // buckets come from a numeric proxy of the hex key (first 8 digits
    // decoded), since quantile boundaries need a number while the in-
    // bucket window orders by the full key.
    QueryDef.checked(
      "q83_shuffled_pack",
      s"""WITH d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey,
         |    len(regexp_extract_all(text, '${DuckSql.nonWs}+')) AS toks FROM documents),
         |c AS (SELECT doc_id, skey, toks,
         |    COALESCE(sum(toks) OVER (ORDER BY skey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM d WHERE toks > 0)
         |SELECT doc_id, CAST(toks AS BIGINT) AS toks, CAST(off AS BIGINT) AS offset,
         |  CAST(off // 512 AS BIGINT) AS first_chunk,
         |  CAST((off + toks - 1) // 512 AS BIGINT) AS last_chunk,
         |  CAST((off + toks - 1) // 512 - off // 512 + 1 AS BIGINT) AS n_chunks
         |FROM c""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("skey"),
          TextFunctions.tokenCount(col("text")).as("toks"))
        .filter(col("toks") > 0)
      graft.operators.Packing.chunkSpans(d, ctxLen = 512,
          orderCol = col("skey"), tokensCol = col("toks"),
          bucketOn = Some(conv(substring(col("skey"), 1, 8), 16, 10).cast("long")))
        .drop("skey")
    },

    // bigram-conditional surprisal -ln P(w_i | w_{i-1}) under the corpus'
    // own bigram counts — one Markov order past q74's unigram gate (word
    // salad scores high even when every word is common). Rounded to 6
    // decimals in both engines, the transcendental-oracle discipline.
    QueryDef.checked(
      "q85_bigram_surprisal",
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS l FROM documents),
         |p AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2 FROM
         |      (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
         |       FROM t WHERE len(l) >= 2)),
         |bg AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY 1, 2),
         |pf AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY 1)
         |SELECT p.doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln(CAST(bg.c2 AS DOUBLE) / pf.c1)), 6) AS avg_surprisal
         |FROM p JOIN bg USING (w1, w2) JOIN pf USING (w1)
         |GROUP BY p.doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Vocabulary.bigramSurprisal(t(s, dir, "documents"))
    },

    // training-shard assignment: shard id = global rank / shardSize under
    // a total order — EXACT shard sizes via the q80 distributed scan
    // (weight 1), where repartitionByRange would give sampled cuts. The
    // oracle replays rank and the per-shard manifest; the on-disk layout
    // (sorted, range-disjoint shard=N files) is pinned in CurationSpec.
    QueryDef.checked(
      "q90_shard_manifest",
      """WITH r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS rank FROM documents)
        |SELECT rank // 64 AS shard, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
      val a = graft.operators.Shards.assign(
        t(s, dir, "documents").select("doc_id"), col("doc_id"), shardSize = 64)
      graft.operators.Shards.manifest(a, col("doc_id"))
        .select(col("shard"), col("n_rows").as("n_docs"),
          col("min_key").as("min_id"), col("max_key").as("max_id"))
    },

    // BPE tokenizer training under the oracle hash: the merge table
    // learned from the corpus' word histogram (distributed scan + TopK;
    // the bounded merge loop is driver compute, the IVF-centroid
    // pattern). The 40 greedy merge DECISIONS — rank, pair, integer
    // co-occurrence count — replay in DuckDB as 40 chained CTE
    // iterations (the q117 fixed-iteration discipline): each word's
    // segmentation rides as a chr(31)-framed symbol string ("·a··b··c·",
    // every symbol wrapped in its own separators — the corpus is
    // whitespace-split so symbols never contain the frame), pair counts
    // come from splitting on the double frame, the argmax tie-breaks
    // (count DESC, pair ASC — binary collation, both engines), and ONE
    // merge applies as a non-overlapping left-to-right string replace of
    // "·l··r·" with "·lr·" — exactly the Scala fold's greedy
    // non-overlap semantics. Integer counts and ASCII tokens only, so
    // the hash pins every decision bit-exactly.
    QueryDef.checked(
      "q89_bpe_merges", {
        val S = "chr(31)"
        val iters = (1 to 40).map { i =>
          s"""p$i AS MATERIALIZED (SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT l, cnt, unnest(generate_series(1, len(l) - 1)) AS i
             |        FROM (SELECT string_split(trim(rep, $S), $S || $S) AS l, cnt
             |              FROM w$i)
             |        WHERE len(l) >= 2)
             |  GROUP BY 1, 2),
             |m$i AS MATERIALIZED (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
             |w${i + 1} AS MATERIALIZED (SELECT replace(rep,
             |    (SELECT $S || a || $S || $S || b || $S FROM m$i),
             |    (SELECT $S || a || b || $S FROM m$i)) AS rep, cnt FROM w$i)"""
            .stripMargin
        }.mkString(",\n")
        val unions = (1 to 40).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS rank, a AS "left", b AS "right",
             |  a || b AS merged, c AS "count" FROM m$i""".stripMargin)
          .mkString("\nUNION ALL\n")
        s"""WITH h AS (
           |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '${DuckSql.ws}+')) AS word
           |        FROM documents)
           |  WHERE length(word) > 0
           |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20000),
           |w1 AS MATERIALIZED (SELECT $S || array_to_string(regexp_split_to_array(word, ''),
           |    $S || $S) || $S AS rep, cnt FROM h),
           |$iters
           |$unions""".stripMargin
      }) { (s, dir) =>
      graft.operators.Bpe.trainDf(s, t(s, dir, "documents"),
        numMerges = 40, maxWords = 20000)
    },

    // DSIR importance weights: every doc scored by how much more likely
    // its hashed-bigram buckets (3 hex chars of md5 → 4096 buckets) are
    // under the target subset (doc_id % 10 = 0 — q77's eval convention)
    // than under the raw corpus, add-one smoothed. The oracle replays the
    // bucketing, both smoothed distributions, and the weighted per-doc
    // mean — selection decisions are pinned cross-engine.
    QueryDef.checked(
      "q86_dsir_weights",
      s"""WITH t AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS l FROM documents),
         |p AS (SELECT doc_id, substring(md5(l[i] || ' ' || l[i+1]), 1, 3) AS bucket FROM
         |      (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
         |       FROM t WHERE len(l) >= 2)),
         |pd AS (SELECT doc_id, bucket, count(*) AS cd FROM p GROUP BY 1, 2),
         |rb AS (SELECT bucket, sum(cd) AS cr FROM pd GROUP BY 1),
         |tb AS (SELECT bucket, sum(cd) AS ct FROM pd WHERE doc_id % 10 = 0 GROUP BY 1),
         |tot AS (SELECT (SELECT sum(cr) FROM rb) AS nr, (SELECT sum(ct) FROM tb) AS nt),
         |r AS (SELECT rb.bucket,
         |    ln((COALESCE(tb.ct, 0) + 1.0) / (tot.nt + 4096))
         |      - ln((rb.cr + 1.0) / (tot.nr + 4096)) AS lr
         |  FROM rb LEFT JOIN tb USING (bucket), tot)
         |SELECT pd.doc_id, CAST(sum(pd.cd) AS BIGINT) AS n_grams,
         |  round(sum(pd.cd * r.lr) / sum(pd.cd), 6) AS avg_log_ratio
         |FROM pd JOIN r USING (bucket)
         |GROUP BY pd.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.operators.Dsir.importanceWeights(
        raw = docs, target = docs.filter(pmod(col("doc_id"), lit(10)) === 0))
    },

    // the Gopher word/line-shape quality rules as one oracle-checked
    // decision table: per-word stats (mean length, alpha fraction, symbol
    // ratio), line stats (bullet starts, ellipsis ends), required-stopword
    // hits, and the first-failing-gate reason under the published
    // thresholds. Every signal is a codegen'd column expression mirrored
    // exactly in SQL.
    QueryDef.checked(
      "q87_gopher_quality",
      s"""WITH e AS (SELECT doc_id, text,
         |    regexp_replace(text, '\\.\\.\\.', '\u2026', 'g') AS canon,
         |    regexp_split_to_array(trim(text), '${DuckSql.ws}+') AS ws,
         |    string_split(text, chr(10)) AS ls
         |  FROM documents),
         |s AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |    round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
         |      / greatest(len(ws), 1), 6) AS mean_word_len,
         |    round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
         |      / greatest(len(ws), 1), 6) AS alpha_word_frac,
         |    round(CAST(length(text) - length(replace(text, '#', ''))
         |        + length(canon) - length(replace(canon, '\u2026', '')) AS DOUBLE)
         |      / greatest(len(ws), 1), 6) AS symbol_word_ratio,
         |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^[ \\t]*[-*\u2022]'))) AS DOUBLE)
         |      / greatest(len(ls), 1), 6) AS bullet_line_frac,
         |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|\u2026)[ \\t]*$$'))) AS DOUBLE)
         |      / greatest(len(ls), 1), 6) AS ellipsis_line_frac,
         |    CAST(${graft.operators.Gopher.RequiredStopwords.map(sw =>
              s"(CASE WHEN regexp_matches(lower(text), '\\b$sw\\b') THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS BIGINT) AS stopword_hits
         |  FROM e),
         |r AS (SELECT *,
         |    CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
         |         WHEN alpha_word_frac < 0.8 THEN 'non_alpha'
         |         WHEN symbol_word_ratio > 0.1 THEN 'symbols'
         |         WHEN bullet_line_frac > 0.9 THEN 'bullets'
         |         WHEN ellipsis_line_frac > 0.3 THEN 'ellipses'
         |         WHEN stopword_hits < 2 THEN 'few_stopwords'
         |         ELSE 'kept' END AS reason
         |  FROM s)
         |SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
         |  symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
         |  stopword_hits, reason, reason = 'kept' AS kept
         |FROM r""".stripMargin) { (s, dir) =>
      graft.operators.Gopher.decide(t(s, dir, "documents"))
    },

    // pairwise source-overlap matrix at sketch cost: per-source theta
    // sketches of word trigrams, every source pair's shared/union gram
    // estimates from sketch algebra — the "how redundant are my corpus
    // sources" question answered in one gram scan + a k²-sketch cross,
    // instead of k² gram self-joins. No cross-engine oracle (sketch
    // bytes); CurationSpec pins the estimates against exact gram-set
    // Jaccard per pair.
    QueryDef.rowsOnly("q114_source_overlap") { (s, dir) =>
      graft.operators.Decontaminate.sourceOverlap(
        t(s, dir, "documents"), n = 3)
        .orderBy(col("src_a"), col("src_b"))
    }
  )
}
