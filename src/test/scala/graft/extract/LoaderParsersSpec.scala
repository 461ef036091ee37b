package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Remaining per-parser loader shapes with fixture files, mirroring the
  * reference's loader tests (tests/test_loaders.py style):
  * UberGraph (S8: int-id tables + CURIE lookup join) and GOA GAF
  * (qualifier→RO predicate, aspect fallback, PMID filtering). */
class LoaderParsersSpec extends SparkSpec {

  // ---- UberGraph (parsers/UberGraph/src/loadUG.py:47-100) ----
  test("ubergraph: int-id edge table joined through node/edge label lookups") {
    import spark.implicits._
    val nodeLabels = Seq((1L, "GO:0001"), (2L, "GO:0002"), (3L, "CHEBI:3")).toDF("node_id", "curie")
    val edgeLabels = Seq((10L, "rdfs:subClassOf"), (11L, "BFO:0000050")).toDF("edge_id", "curie")
    val edges = Seq((1L, 10L, 2L), (2L, 11L, 3L), (1L, 99L, 2L), (7L, 10L, 2L))
      .toDF("subject_id", "predicate_id", "object_id")

    val subj = nodeLabels.select(col("node_id").as("subject_id"), col("curie").as("subject"))
    val obj = nodeLabels.select(col("node_id").as("object_id"), col("curie").as("object"))
    val pred = edgeLabels.select(col("edge_id").as("predicate_id"), col("curie").as("predicate"))
    // inner joins drop unmapped ids — the reference's skip counter
    val out = edges
      .join(broadcast(subj), Seq("subject_id"))
      .join(broadcast(obj), Seq("object_id"))
      .join(broadcast(pred), Seq("predicate_id"))
      .select(col("subject"), col("predicate"), col("object"),
        lit("infores:ubergraph").as("primary_knowledge_source"),
        lit("knowledge_assertion").as("knowledge_level"),
        lit("manual_agent").as("agent_type"))
    assert(out.count() == 2) // unmapped predicate 99 and node 7 skipped
    val subclassOnly = out.filter(col("predicate") === "rdfs:subClassOf")
    assert(subclassOnly.count() == 1) // only_subclass_edges variant
  }

  // ---- GOA GAF (parsers/GOA/src/loadGOA.py) ----
  private val goaPredicates = Map(
    "enables" -> "RO:0002327", "involved_in" -> "RO:0002331",
    "located_in" -> "RO:0001025", "contributes_to" -> "RO:0002326",
    "acts_upstream_of" -> "RO:0002263", "part_of" -> "BFO:0000050")

  private def goaPredicate(qualifier: org.apache.spark.sql.Column,
                           aspect: org.apache.spark.sql.Column) = {
    val mapped = goaPredicates.foldLeft(lit(null).cast("string")) {
      case (acc, (q, ro)) => when(qualifier === q, ro).otherwise(acc)
    }
    when(qualifier.contains("|"), lit(null)) // NOT|enables negation unsupported
      .when(qualifier.isNull || qualifier === "",
        when(aspect === "F", goaPredicates("enables"))
          .when(aspect === "P", goaPredicates("involved_in"))
          .when(aspect === "C", goaPredicates("located_in")))
      .otherwise(mapped)
  }

  test("goa gaf: qualifier→RO predicate with aspect fallback + PMID pubs") {
    val dir = java.nio.file.Files.createTempDirectory("goa")
    val f = dir.resolve("goa_human.gaf")
    java.nio.file.Files.writeString(f, Seq(
      "!gaf-version: 2.2",
      Seq("UniProtKB", "P04637", "TP53", "enables", "GO:0003677", "GO_REF:0000043|PMID:1234", "IEA",
        "", "F", "Cellular tumor antigen p53", "", "protein", "taxon:9606", "20240101", "UniProt", "", "").mkString("\t"),
      Seq("UniProtKB", "P04637", "TP53", "", "GO:0006915", "PMID:5678", "IDA",
        "", "P", "Cellular tumor antigen p53", "", "protein", "taxon:9606", "20240101", "UniProt", "", "").mkString("\t"),
      Seq("UniProtKB", "Q00001", "XYZ", "NOT|enables", "GO:0003677", "PMID:9", "IEA",
        "", "F", "x", "", "protein", "taxon:9606", "20240101", "UniProt", "", "").mkString("\t")
    ).mkString("\n"))

    val raw = spark.read.option("sep", "\t").option("comment", "!").csv(f.toString)
      .toDF("db", "db_object_id", "symbol", "qualifier", "go_id", "db_reference",
        "evidence", "with_from", "aspect", "name", "synonym", "obj_type",
        "taxon", "date", "assigned_by", "ext", "form_id")

    val parsed = raw
      .withColumn("predicate", goaPredicate(col("qualifier"), col("aspect")))
      .filter(col("predicate").isNotNull)
      .select(
        concat(lit("UniProtKB:"), col("db_object_id")).as("subject"),
        col("predicate"),
        col("go_id").as("object"),
        filter(split(col("db_reference"), "\\|"), r => r.contains("PMID")).as("publications"),
        concat(lit("NCBITaxon:"), regexp_extract(col("taxon"), "taxon:(\\d+)", 1)).as("taxon"))

    assert(parsed.count() == 2) // negation row dropped
    val enables = parsed.filter(col("predicate") === "RO:0002327").head()
    assert(enables.getSeq[String](enables.fieldIndex("publications")) == Seq("PMID:1234"))
    val aspectFallback = parsed.filter(col("object") === "GO:0006915").head()
    assert(aspectFallback.getAs[String]("predicate") == "RO:0002331") // P → involved_in
    assert(aspectFallback.getAs[String]("taxon") == "NCBITaxon:9606")
  }
}
