package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level deduplication (the CCNet/RefinedWeb boilerplate pass):
  * a line occurring in many distinct documents is navigation chrome,
  * cookie banners, or license boilerplate — it is removed from every
  * document while the documents themselves survive with their remaining
  * lines in original order.
  *
  * Distributed shape: one `posexplode` over the line split, a line-count
  * aggregation (map-side partial), one equi-join back on the line
  * string, and a per-document reassembly via `collect_list` of
  * (pos, line) structs sorted in-array — no global sort, no driver
  * loop. The join key is the raw line, so pathologically common lines
  * (the empty line, "Home") are hot keys — exactly what AQE skew-join
  * splitting is enabled for in [[graft.SparkEnv]]; a 100 TB deployment
  * would additionally pre-hash lines to fixed-width keys, which changes
  * bytes shuffled but not the plan shape.
  */
object LineDedup {

  /** Per-document cleaned text after dropping lines that occur in at
    * least `minDocs` distinct documents: (idCol, n_lines, n_removed,
    * cleaned). `cleaned` preserves the original relative order of the
    * surviving lines; a document whose every line is boilerplate comes
    * back as the empty string.
    */
  def clean(docs: DataFrame, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n", -1)))
      .toDF(idCol, "pos", "line")
    val lineDf = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("__nd"))
    lines.join(lineDf, Seq("line"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__nd") >= minDocs, 1L).otherwise(0L)).as("n_removed"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(col("__nd") < minDocs, struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("cleaned"))
  }
}
