package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** UPheno cross-species phenotype homology parser (OBO source format).
  *
  * Reference (parsers/UPheno/src/loadUPheno.py:14-165):
  *  - [Term] stanzas parse to (id, name, is_a list, is_obsolete);
  *    obsolete/id-less terms skipped;
  *  - species-A terms (e.g. HP:) and species-B terms (e.g. MP:) sharing an
  *    UPHENO is_a parent pair up as biolink:homologous_to candidates;
  *  - each inferred pair carries its sorted supporting generic parents as
  *    `upheno_generic_parent`, logical_entailment / data_pipeline;
  *  - nodes are PhenotypicFeature with the OBO names.
  *
  * Spark-first: stanzas scan as blank-line-separated blocks (custom
  * lineSep — still a distributed text scan), parse with pure column
  * splits, and the A×B pairing is a self-join on the generic parent —
  * the reference's nested dict loops as one equi-join.
  */
object UPheno {

  val provenance = "infores:upheno"
  val predicate = "biolink:homologous_to"

  /** OBO [Term] stanzas → (id, name, is_a array, obsolete). */
  def readTerms(spark: SparkSession, path: String): DataFrame = {
    val stanzas = spark.read.option("lineSep", "\n\n").text(path)
      .filter(col("value").startsWith("[Term]"))
      .select(split(col("value"), "\n").as("lines"))
    stanzas.select(
      element_at(filter(col("lines"), l => l.startsWith("id: ")), 1).substr(lit(5), lit(4096)).as("id"),
      element_at(filter(col("lines"), l => l.startsWith("name: ")), 1).substr(lit(7), lit(4096)).as("name"),
      transform(filter(col("lines"), l => l.startsWith("is_a: ")),
        l => element_at(split(l.substr(lit(7), lit(4096)), " "), 1)).as("is_a"),
      exists(col("lines"), l => l.startsWith("is_obsolete: true")).as("is_obsolete"))
      .filter(col("id").isNotNull && !col("is_obsolete"))
  }

  private def prefixIn(c: Column, prefixes: Seq[String]): Column =
    prefixes.map(p => c.startsWith(p + ":")).reduce(_ || _)

  def parse(spark: SparkSession, path: String,
            speciesAPrefixes: Seq[String], speciesBPrefixes: Seq[String],
            genericPrefixes: Seq[String] = Seq("UPHENO")): ExtractedGraph = {
    require(speciesAPrefixes.nonEmpty && speciesBPrefixes.nonEmpty,
      "species A and B phenotype prefixes must be configured")
    val terms = readTerms(spark, path)
      .select(col("id"), col("name"), explode(col("is_a")).as("parent"))
      .filter(prefixIn(col("parent"), genericPrefixes))
      .localCheckpoint() // both sides of the pairing join re-enter

    val a = terms.filter(prefixIn(col("id"), speciesAPrefixes))
      .select(col("parent"), col("id").as("a_id"), col("name").as("a_name"))
    val b = terms.filter(prefixIn(col("id"), speciesBPrefixes))
      .select(col("parent"), col("id").as("b_id"), col("name").as("b_name"))

    val pairs = a.join(b, Seq("parent"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(array_sort(collect_set(col("parent"))).as("upheno_generic_parent"),
        first(col("a_name")).as("a_name"), first(col("b_name")).as("b_name"))

    val edges = pairs.select(
      col("a_id").as(Biolink.Subject),
      lit(predicate).as(Biolink.Predicate),
      col("b_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col("upheno_generic_parent"),
      lit("logical_entailment").as(Biolink.KnowledgeLevel),
      lit("data_pipeline").as(Biolink.AgentType))

    val nodes = pairs.select(col("a_id").as("id"), col("a_name").as("name"))
      .unionByName(pairs.select(col("b_id").as("id"), col("b_name").as("name")))
      .dropDuplicates("id")
      .select(col("id"), col("name"), array(lit("biolink:PhenotypicFeature")).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
