package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Biolink

/** Post-merge graph derivations (SURVEY §2.8 D1/D2).
  * Both are expression-only generators: the Biolink hierarchy fragments are
  * folded into the plan as literal maps (broadcast-equivalent for lookup
  * tables this size), and the fan-out is a single `explode` — no UDTF.
  */
object DerivedGraphs {

  private def mapCol(m: Map[String, Seq[String]]): Column =
    typedLit(m)

  private def qcol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** D1 — redundant KG (ontology-closure expansion), semantics of
    * orion/redundant_kg.py:51-106:
    *  - permutations of object-aspect ancestors × (none + object-direction
    *    ancestors), qualified_predicate retained, original predicate
    *  - if an aspect qualifier existed: one qualifier-stripped copy with the
    *    original predicate
    *  - one qualifier-stripped copy per strict ancestor predicate.
    * Output adds nothing else; every row of the input fans out to ≥1 rows.
    */
  def redundantEdges(edges: DataFrame): DataFrame = {
    val aspectAnc = mapCol(Biolink.aspectAncestors)
    val dirAnc = mapCol(Biolink.directionAncestors)
    val predAnc = mapCol(Biolink.predicateAncestors)

    val aspect = qcol(edges, "object_aspect_qualifier")
    val direction = qcol(edges, "object_direction_qualifier")

    // aspect values: ancestors incl self, or [null] when absent
    val aspectValues = when(aspect.isNotNull,
      coalesce(element_at(aspectAnc, aspect), array(aspect)))
      .otherwise(array(lit(null).cast("string")))
    // direction values: none + ancestors incl self when present
    val directionValues = when(direction.isNotNull,
      concat(array(lit(null).cast("string")),
        coalesce(element_at(dirAnc, direction), array(direction))))
      .otherwise(array(lit(null).cast("string")))

    val basePred = col(Biolink.Predicate)
    // struct(per-expansion): predicate, aspect, direction, strip-qualifiers?
    val permutations = flatten(transform(aspectValues, a =>
      transform(directionValues, d =>
        struct(basePred.as("p"), a.as("a"), d.as("d"), lit(false).as("strip")))))
    val strippedSelf = when(aspect.isNotNull,
      array(struct(basePred.as("p"), lit(null).cast("string").as("a"),
        lit(null).cast("string").as("d"), lit(true).as("strip"))))
      .otherwise(array().cast("array<struct<p:string,a:string,d:string,strip:boolean>>"))
    val ancestorCopies = transform(
      filter(coalesce(element_at(predAnc, basePred), array()), p => p =!= basePred),
      p => struct(p.as("p"), lit(null).cast("string").as("a"),
        lit(null).cast("string").as("d"), lit(true).as("strip")))

    val expansions = concat(permutations, strippedSelf, ancestorCopies)
    val passthrough = edges.columns.filterNot(Set(
      Biolink.Predicate, "object_aspect_qualifier", "object_direction_qualifier",
      "qualified_predicate")).map(col)

    edges
      .select(passthrough :+ qcol(edges, "qualified_predicate").as("_qp") :+
        explode(expansions).as("_x"): _*)
      .select(passthrough ++ Seq(
        col("_x.p").as(Biolink.Predicate),
        col("_x.a").as("object_aspect_qualifier"),
        when(!col("_x.strip"), col("_x.d")).otherwise(lit(null)).as("object_direction_qualifier"),
        when(!col("_x.strip"), col("_qp")).otherwise(lit(null)).as("qualified_predicate")): _*)
  }

  /** D2 — collapsed-qualifiers predicate grammar
    * (orion/collapse_qualifiers.py:55-171): the 14-qualifier statement in
    * fixed order with the reference's semantic adjustments; edges with no
    * qualifiers keep their predicate. Qualifier columns are dropped. */
  def collapsedQualifierEdges(edges: DataFrame): DataFrame = {
    def q(name: String): Column = qcol(edges, name)

    def part(c: Column, sep: String = "_"): Column =
      when(c.isNotNull, concat(c, lit(sep))).otherwise(lit(""))
    def aspectAdj(c: Column): Column =
      when(c.isNotNull,
        when(c.endsWith("interaction"), concat(c, lit("_with")))
          .otherwise(concat(c, lit("_of"))))
    def formAdj(c: Column): Column = when(c.isNotNull, concat(c, lit("_of")))

    val statement = concat(
      part(q("subject_direction_qualifier")),
      part(aspectAdj(q("subject_aspect_qualifier"))),
      part(formAdj(q("subject_form_or_variant_qualifier"))),
      lit("<subject_node>_"),
      part(q("subject_derivative_qualifier")),
      part(q("subject_part_qualifier")),
      part(regexp_replace(q("qualified_predicate"), "^biolink:", "")),
      part(q("object_direction_qualifier")),
      part(aspectAdj(q("object_aspect_qualifier"))),
      part(formAdj(q("object_form_or_variant_qualifier"))),
      lit("<object_node>"),
      when(q("object_derivative_qualifier").isNotNull,
        concat(lit("_"), q("object_derivative_qualifier"))).otherwise(lit("")),
      when(q("object_part_qualifier").isNotNull,
        concat(lit("_"), q("object_part_qualifier"))).otherwise(lit("")),
      when(q("causal_mechanism_qualifier").isNotNull,
        concat(lit("_via_"), q("causal_mechanism_qualifier"))).otherwise(lit("")),
      when(q("species_context_qualifier").isNotNull,
        concat(lit("_in_"), q("species_context_qualifier"))).otherwise(lit("")),
      when(q("anatomical_context_qualifier").isNotNull,
        when(q("species_context_qualifier").isNotNull,
          concat(lit("_"), q("anatomical_context_qualifier")))
          .otherwise(concat(lit("_in_"), q("anatomical_context_qualifier"))))
        .otherwise(lit("")))

    // the reference's placeholders make the statement non-empty even with
    // zero qualifiers (the keep-original else-branch there is unreachable);
    // we implement the documented intent: unqualified edges keep their
    // predicate (orion/collapse_qualifiers.py:163-167 comment)
    val hasAnyQualifier = Biolink.qualifierKeys.toSeq.sorted
      .map(k => qcol(edges, k).isNotNull)
      .reduce(_ || _)

    val keep = edges.columns.filterNot(Biolink.qualifierKeys.contains)
    edges
      .withColumn("_collapsed",
        when(hasAnyQualifier, statement).otherwise(col(Biolink.Predicate)))
      .select(keep.map(c =>
        (if (c == Biolink.Predicate) col("_collapsed") else col(c)).as(c)): _*)
  }
}
