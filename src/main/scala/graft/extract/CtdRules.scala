package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CTD parser rules (SURVEY §2.3 P2/P4, §2.5 A9).
  * Reference: parsers/CTD/src/loadCTD.py — the most rule-heavy parser:
  * predicate cleaning (:528-545), chemical↔disease evidence vote
  * (:547-587), PMID-count row gates (:473-526).
  */
object CtdRules {

  /** P4 — predicate cleaning: `/`, ` `, `^` → `_`, then the conversion map
    * (loadCTD.py:32-36). */
  val predicateConversionMap: Map[String, String] = Map(
    "CTD:decreases_molecular_interaction_with" -> "CTD:decreases_molecular_interaction",
    "CTD:increases_molecular_interaction_with" -> "CTD:increases_molecular_interaction",
    "CTD:ameliorates" -> "biolink:treats_or_applied_or_studied_to_treat")

  def cleanPredicate(predicate: Column): Column = {
    val cleaned = regexp_replace(predicate, "[/ ^]", "_")
    val entries = predicateConversionMap.toSeq
    entries.foldLeft(cleaned) { case (acc, (from, to)) =>
      when(cleaned === from, lit(to)).otherwise(acc)
    }
  }

  /** A9 — the evidence vote (get_chemical_label_id :547-587) as a pure
    * Column expression over (therapeutic_count, marker_count):
    * null = not enough evidence (caller drops the pair). */
  def chemicalDiseaseVote(therapeutic: Column, marker: Column,
                          therapeuticPredicate: String = "biolink:treats",
                          markerPredicate: String = "biolink:biomarker_for"): Column = {
    val t = therapeutic.cast("double")
    val m = marker.cast("double")
    val markerWins = (t === 1 && m > 1) || (m / t > 2)
    val therapeuticWins = (m === 1 && t > 1) || (t / m > 2)
    when(t === m && t < 3, lit(null).cast("string"))
      .when(m === 0 && t > 0, therapeuticPredicate)
      .when(t === 0 && m > 0, markerPredicate)
      .when(markerWins, markerPredicate)
      .when(therapeuticWins, therapeuticPredicate)
      .otherwise("biolink:related_to")
  }

  /** The grouped chem→disease aggregation feeding the vote
    * (ref :304-471): per (chemical, disease) count DirectEvidence classes,
    * union publications, vote, drop null verdicts. */
  def chemicalDiseaseEdges(rows: DataFrame): DataFrame = {
    rows
      .groupBy(col("chemical_id"), col("disease_id"))
      .agg(
        sum(when(col("direct_evidence") === "therapeutic", 1).otherwise(0)).as("n_therapeutic"),
        sum(when(col("direct_evidence") === "marker/mechanism", 1).otherwise(0)).as("n_marker"),
        array_sort(array_distinct(flatten(collect_list(col("publications"))))).as("publications"))
      .withColumn("predicate", chemicalDiseaseVote(col("n_therapeutic"), col("n_marker")))
      .filter(col("predicate").isNotNull)
      .select(col("chemical_id").as("subject"), col("predicate"),
        col("disease_id").as("object"),
        lit("infores:ctd").as("primary_knowledge_source"), col("publications"))
  }

  /** P2 — row gates: drop rows containing '?', require PMID support
    * (ref :473-526 shape: ≥3 PMIDs for weak predicate classes, ≥2 others). */
  def pmidGate(predicate: Column, publications: Column,
               weakPredicates: Seq[String]): Column =
    when(predicate.isin(weakPredicates: _*), size(publications) >= 3)
      .otherwise(size(publications) >= 2)
}
