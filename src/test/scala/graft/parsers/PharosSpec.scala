package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PHAROS over embedded Derby: curie fixups, dtype routing, DGIDB
  * predicates, TIGA skip. */
class PharosSpec extends SparkSpec {

  private def seedDb(): String =
    DerbyFixtures.seedPharos(java.nio.file.Files.createTempDirectory("graft-derby-").toString)

  test("gene-disease curie fixups, dtype provenance routing, TIGA skipped") {
    val g = Pharos.parse(spark, seedDb())
    val edges = g.edges.collect()
    assert(edges.length == 5) // 3 disease (TIGA skipped) + 1 drug + 1 cmpd
    val byObj = edges.map(r => r.getAs[String]("object") -> r).toMap
    val umls = byObj("UMLS:C0002871")
    assert(umls.getAs[String]("predicate") == "WIKIDATA_PROPERTY:P2293")
    assert(umls.getAs[String]("primary_knowledge_source") == "infores:disgenet")
    assert(umls.getAs[Double]("score") == 0.4)
    assert(byObj.contains("ORPHANET:846"))
    val omim = byObj("OMIM:102700")
    assert(omim.getAs[String]("predicate") == "biolink:target_for") // DrugCentral rows
    assert(omim.getAs[String]("knowledge_level") == "knowledge_assertion")
    assert(!byObj.contains("DOID:1")) // TIGA skipped

    val act = edges.filter(_.getAs[String]("object") == "HGNC:186")
    assert(act.length == 2)
    val chembl = act.find(_.getAs[String]("subject").startsWith("CHEMBL")).get
    assert(chembl.getAs[String]("subject") == "CHEMBL.COMPOUND:CHEMBL1234")
    assert(chembl.getAs[String]("predicate") == "DGIdb:inhibitor")
    assert(chembl.getAs[String]("affinity_parameter") == "pIC50")
    val gtopdb = act.find(_.getAs[String]("subject").startsWith("GTOPDB")).get
    assert(gtopdb.getAs[String]("subject") == "GTOPDB:5035")
    assert(gtopdb.getAs[String]("predicate") == "DGIdb:inhibitor") // Ki
    assert(gtopdb.getAs[scala.collection.Seq[String]]("publications") ==
      Seq("PMID:11111", "PMID:22222"))

    // sanitize_name: non-ascii é replaced
    val disease = g.nodes.filter(col("id") === "UMLS:C0002871").head()
    assert(disease.getAs[String]("name") == "an?mia")
  }
}
