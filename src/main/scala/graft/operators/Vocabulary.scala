package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary and unigram statistics — the tokenizer-training and
  * LM-scoring steps of a data pipeline.
  *
  * `build` produces the deterministic top-`size` vocabulary (count desc,
  * token asc — the tie order every tokenizer trainer fixes so retrains
  * are reproducible). The plan is the scalable top-k shape: distributed
  * word count, `orderBy(...).limit(size)` (Spark's distributed TopK — no
  * global sort materializes), and only the BOUNDED `size` rows pass
  * through the id-assignment window.
  *
  * `surprisal` scores each document by its average unigram surprisal
  * −ln p(w) under the corpus' own unigram distribution — the cheap
  * perplexity proxy used as a quality gate (gibberish and boilerplate
  * both sit in the tails). Two aggregation passes plus one broadcast-able
  * frequency join; no per-row vocabulary structure.
  */
object Vocabulary {

  private def words(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(split(trim(col(textCol)), TextFunctions.WS + "+")).as("tok"))

  /** Top-`size` vocabulary: (id, tok, cnt), id = 1-based rank by
    * (count desc, token asc).
    */
  def build(docs: DataFrame, size: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    words(docs, idCol, textCol)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(size)
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
      .select(col("id"), col("tok"), col("cnt"))

  /** Per-document average bigram-conditional surprisal −ln P(wᵢ | wᵢ₋₁)
    * under the corpus' own bigram counts (P = c(w₁w₂)/Σ_w c(w₁w)) — one
    * Markov order past [[surprisal]], separating locally-incoherent text
    * (word salad scores high) from merely rare vocabulary. Shapes: one
    * `lead` window per doc (the [[Repetition]] trick), two
    * map-side-combined gram counts, two equi-joins on gram keys — linear
    * in corpus tokens. Documents with fewer than 2 tokens are absent.
    */
  def bigramSurprisal(docs: DataFrame, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = docs.select(col(idCol),
        posexplode(split(trim(col(textCol)), TextFunctions.WS + "+")))
      .toDF(idCol, "pos", "w1")
    val pairs = w
      .withColumn("w2", lead(col("w1"), 1).over(
        Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("w1"), col("w2"))
    // per-doc gram counts materialize ONCE (the Dedup token-relation
    // pattern): bg, pf and the final join all derive from `pd`, so the
    // explode + lead window runs a single time instead of three
    val pd = pairs.groupBy(idCol, "w1", "w2")
      .agg(count(lit(1)).as("cd")).localCheckpoint()
    val bg = pd.groupBy("w1", "w2").agg(sum("cd").as("c2"))
    val pf = bg.groupBy("w1").agg(sum("c2").as("c1"))
    val sup = bg.join(pf, Seq("w1"))
      .withColumn("sup", -log(col("c2").cast("double") / col("c1")))
    pd.join(sup, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(sum("cd").as("n_bigrams"),
        round(sum(col("cd") * col("sup")) / sum(col("cd")), scale).as("avg_surprisal"))
  }

  /** Order-preserving tokenization under a built vocabulary: every token
    * mapped to its vocabulary id (0 = out-of-vocabulary), reassembled in
    * position order — the "apply the tokenizer at corpus scale" step.
    * Returns (idCol, n_tokens, n_oov, oov_rate, ids) with `ids` the
    * space-joined id sequence. The vocabulary is BOUNDED by construction
    * ([[build]]'s `size`), so the token→id map is a broadcast join; the
    * reassembly is the same in-array sort used for line dedup — one
    * shuffle by document, no global order.
    */
  def encode(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        posexplode(split(trim(col(textCol)), TextFunctions.WS + "+")))
      .toDF(idCol, "pos", "tok")
      .join(broadcast(vocab.select(col("tok"), col("id").as("__tid"))), Seq("tok"), "left")
      .withColumn("__tid", coalesce(col("__tid"), lit(0L)))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("__tid")))),
            s => s.getField("__tid").cast("string"))).as("ids"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"), col("ids"))

  /** Per-document average unigram surprisal under the corpus' own
    * distribution: (idCol, n_toks, avg_surprisal). `scale` rounds the
    * result (surprisal is a transcendental of a ratio — rounding keeps it
    * comparable across engines/libms).
    */
  def surprisal(docs: DataFrame, scale: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = words(docs, idCol, textCol)
    val freq = w.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("n"))
    w.join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("sup", -log(col("cnt").cast("double") / col("n")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        round(avg(col("sup")), scale).as("avg_surprisal"))
  }
}
