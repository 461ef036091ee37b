package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — split documents into variable-size
  * chunks whose boundaries depend on local CONTENT, not position, so an
  * insertion near the head of a document shifts only the chunk it lands
  * in and its neighbor; every later chunk keeps its bytes and its digest.
  * That stability is what makes chunk-level dedup/delta-storage work
  * (the LBFS/rsync idea — Muthitacharoen et al., SOSP 2001 — at token
  * granularity for training-data pipelines).
  *
  * Boundary rule: after token i (1-based, i ≥ context) iff the md5 of
  * the last `context` tokens starts with a hex digit below `16/divisor`
  * — expected chunk length ≈ divisor tokens. md5 keeps the rule
  * reproducible in ANY engine (the DuckDB oracle recomputes it exactly);
  * a production variant would swap in the codegen'd rolling hash from
  * functions.TextExpressions, trading oracle-checkability for speed.
  *
  * Scale shape: posexplode → per-document windows (partitioned by
  * doc_id, bounded by document length — never a global window) → one
  * groupBy (doc_id, chunk). Chunking a 100 TB corpus is embarrassingly
  * parallel per document.
  */
object Chunker {

  /** (doc_id, chunk_id, n_tokens, start_pos, digest) per content-defined
    * chunk; `chunk_id` counts from 0 in token order, `digest` is the md5
    * of the space-joined chunk tokens. Empty documents yield no rows. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                context: Int = 3, boundaryDigits: String = "0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // boundary AFTER token i when md5(last `context` tokens) opens with a
    // boundary digit; the first context-1 tokens can't form a full window
    val ctx = concat_ws(" ",
      (context - 1 to 1 by -1).map(j => lag(col("tok"), j).over(w)) :+ col("tok"): _*)
    val flagged = toks.withColumn("boundary",
      when(row_number().over(w) >= context &&
        substring(md5(ctx), 1, 1).isin(boundaryDigits.split(""). toSeq: _*), 1)
        .otherwise(0))
    // chunk id = boundaries strictly BEFORE this token (lag, then prefix
    // sum — two steps: Spark rejects a window function nested inside
    // another window's aggregate)
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = flagged
      .withColumn("prev_boundary", lag(col("boundary"), 1, 0).over(w))
      .withColumn("chunk_id", sum(col("prev_boundary")).over(wcum).cast("long"))
    assigned.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("pos")).cast("long").as("start_pos"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("digest"))
  }

  /** Sliding-window token chunking — the RAG / context-window packing
    * shape (fixed `size`-token windows every `stride` tokens, overlap =
    * size − stride), complementing [[cdcChunks]]' content-defined
    * boundaries. Start offsets are 0, stride, 2·stride, … while they
    * still index a token; blank documents yield no chunks.
    *
    * The window slice is taken INSIDE the explode lambda, so each output
    * row carries only its ≤`size`-token window, never a copy of the whole
    * document's token array — at 100 TB the fan-out cost is the chunk
    * text itself. Pure codegen'd array functions, no UDF, no shuffle
    * (a per-row flatMap: the input's partitioning survives untouched).
    * Returns the id column plus (chunk_idx, n_tok, first_tok, last_tok).
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks: Column = TextOps.tokens(col(textCol))
    val arrSize = org.apache.spark.sql.functions.size _ // `size` is a param here
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(transform(
          sequence(lit(0), floor((arrSize(toks) - lit(1)) / lit(stride)).cast("int")),
          i => struct(
            i.cast("long").as("cidx"),
            slice(toks, i * stride + 1, lit(size)).as("chunk")))).as("c"))
      .select(col(idCol),
        col("c.cidx").as("chunk_idx"),
        arrSize(col("c.chunk")).cast("long").as("n_tok"),
        element_at(col("c.chunk"), 1).as("first_tok"),
        element_at(col("c.chunk"), -1).as("last_tok"))
  }
}
