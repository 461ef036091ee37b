package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring deduplication (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", ACL 2022) at token granularity:
  * any run of `minLen` consecutive tokens that occurs more than once in
  * the corpus is a duplicated span, and every occurrence EXCEPT the
  * canonical first (smallest (doc_id, pos)) is removed — the canonical
  * copy survives, so no content is lost, only repetition.
  *
  * The reference construction (a corpus-wide suffix array) is inherently
  * sequential; the Spark-first shape is the n-gram occurrence index:
  *
  *  1. per document, one digest per `minLen`-token window (array
  *     expressions over the token array — no join, no window function);
  *  2. one map-side-combinable groupBy(digest) keeping `count` and the
  *     min packed (doc_id, pos) key — the canonical occurrence is a
  *     hash aggregate, NOT a per-digest row_number sort, so a boilerplate
  *     digest with millions of occurrences costs one combiner cell,
  *     not a skewed sort partition;
  *  3. non-canonical occurrences of duplicated digests explode to their
  *     `minLen` covered positions (bounded by dup volume, not corpus
  *     size), distinct, and anti-join the token stream;
  *  4. per-doc rollup: kept-token count + digest of the cleaned text.
  *
  * Overlapping duplicated windows union naturally through the distinct
  * covered-position set — the merged "duplicated span" of the paper is
  * exactly the union of its covered windows. md5 window digests keep the
  * whole operator reproducible in any engine (the DuckDB oracle recomputes
  * them verbatim); a production variant would swap in the codegen'd
  * rolling hash from functions.TextExpressions.
  */
object SpanDedup {

  /** Per-document substring-dedup report: `n_tokens` original tokens,
    * `n_dup_tokens` removed as non-canonical duplicated-span content, and
    * `clean_digest` = md5 of the space-joined surviving tokens (md5("")
    * for a fully-duplicated document). Documents with blank text yield no
    * row; documents shorter than `minLen` tokens pass through untouched. */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int = 15): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("toks"))
      .filter(size(col("toks")) > 0)
    val grams = toks
      .filter(size(col("toks")) >= minLen)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - minLen),
          i => md5(array_join(slice(col("toks"), i + 1, lit(minLen)), " "))))
        .as(Seq("pos", "digest")))
    // canonical occurrence as min over a fixed-width packed key: min(string)
    // hash-aggregates (min(struct) would force a SortAggregate — a
    // per-partition sort the packed key avoids); zero-padded decimal keeps
    // lexicographic = (doc_id, pos) numeric order for non-negative ids
    def occKey(doc: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column) =
      concat(lpad(doc.cast("string"), 19, "0"), lit(":"),
        lpad(pos.cast("string"), 10, "0"))
    val dupFirsts = grams.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occ"),
        min(occKey(col("doc_id"), col("pos"))).as("first_occ"))
      .filter(col("n_occ") > 1)
      .select(col("digest"), col("first_occ"))
    val covered = grams.join(dupFirsts, "digest")
      .filter(occKey(col("doc_id"), col("pos")) =!= col("first_occ"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + minLen - 1)).as("pos"))
      .distinct()
    val positions = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val keptAgg = positions.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("clean_digest"))
    positions.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dup_tokens"),
        coalesce(col("clean_digest"), md5(lit(""))).as("clean_digest"))
  }
}
