package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DrugCentral over embedded Derby — the SQL-sourced loader end-to-end
  * through SqlSource (S4). */
class DrugCentralSpec extends SparkSpec {

  private def seedDb(): String =
    DerbyFixtures.seedDrugCentral(java.nio.file.Files.createTempDirectory("graft-derby-").toString)

  test("three SQL extractions: omop map, faers gates, bioactivity predicates") {
    val g = DrugCentral.parse(spark, seedDb())
    assert(g.edges.count() == 5) // 2 omop + 1 faers + 2 bioactivity
    val edges = g.edges.collect()

    val omop = edges.filter(_.getAs[String]("predicate") == "RO:0002606")
    assert(omop.length == 1 && omop.head.getAs[String]("object") == "UMLS:C0011849")
    assert(edges.exists(_.getAs[String]("predicate") == "NCIT:C37933")) // contraindication

    val ae = edges.filter(_.getAs[String]("predicate") == "biolink:has_adverse_event")
    assert(ae.length == 1)
    assert(ae.head.getAs[String]("object") == "MEDDRA:10020772")
    assert(ae.head.getAs[String]("primary_knowledge_source") == "infores:faers")
    assert(ae.head.getAs[scala.collection.Seq[String]]("aggregator_knowledge_source") ==
      Seq("infores:drugcentral"))
    assert(ae.head.getAs[Double]("FAERS_llr") == 120.5)

    // action_type INHIBITOR -> DGIdb:inhibitor, CHEMBL source -> chembl pks
    val inh = edges.filter(_.getAs[String]("predicate") == "DGIdb:inhibitor")
    assert(inh.length == 1)
    assert(inh.head.getAs[String]("object") == "UniProtKB:P00374")
    assert(inh.head.getAs[String]("primary_knowledge_source") == "infores:chembl")
    assert(inh.head.getAs[Double]("affinity") == 7.2)
    assert(inh.head.getAs[String]("affinity_parameter") == "pIC50")

    // no action_type -> act_type Kd -> RO:0002436; literature pubmed URL -> PMID
    val kd = edges.filter(_.getAs[String]("predicate") == "RO:0002436")
    assert(kd.length == 1)
    assert(kd.head.getAs[String]("primary_knowledge_source") == "infores:drugcentral")
    assert(kd.head.getAs[scala.collection.Seq[String]]("publications") == Seq("PMID:12345"))
  }

  test("unmapped relationship names break the parse (SourceDataBrokenError)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-").toString
    val url = s"jdbc:derby:$dir/dcdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE omop_relationship (
        struct_id INT, relationship_name VARCHAR(64), umls_cui VARCHAR(16), cui_semantic_type VARCHAR(8))""")
      st.execute("INSERT INTO omop_relationship VALUES (5, 'mystery-relation', 'C0011849', 'T047')")
      st.execute("CREATE TABLE faers (struct_id INT, meddra_code VARCHAR(16), llr DOUBLE, llr_threshold DOUBLE, drug_ae INT)")
      st.execute("""CREATE TABLE act_table_full (
        struct_id INT, act_value DOUBLE, act_unit VARCHAR(16), act_type VARCHAR(16),
        act_source VARCHAR(32), act_source_url VARCHAR(128), action_type VARCHAR(32), target_id INT)""")
      st.execute("CREATE TABLE td2tc (target_id INT, component_id INT)")
      st.execute("CREATE TABLE target_component (id INT, accession VARCHAR(16))")
      st.close()
    } finally conn.close()
    val e = intercept[IllegalArgumentException] { DrugCentral.parse(spark, url) }
    assert(e.getMessage.contains("no predicate mapping"))
  }
}
