package graft.parsers

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PHAROS over embedded Derby: curie fixups, dtype routing, DGIDB
  * predicates, TIGA skip. */
class PharosSpec extends SparkSpec {

  private def seedDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pharos-").toString
    val url = s"jdbc:derby:$dir/tcrd;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE protein (id INT, sym VARCHAR(32))")
      st.execute("INSERT INTO protein VALUES (1, 'ADA')")
      st.execute("CREATE TABLE xref (protein_id INT, xtype VARCHAR(16), value VARCHAR(32))")
      st.execute("INSERT INTO xref VALUES (1, 'HGNC', 'HGNC:186')")
      st.execute("INSERT INTO xref VALUES (1, 'Ensembl', 'ENSG1')") // non-HGNC ignored
      st.execute("""CREATE TABLE disease (
        protein_id INT, did VARCHAR(32), name VARCHAR(64), dtype VARCHAR(64), score DOUBLE)""")
      st.execute("INSERT INTO disease VALUES (1, 'C0002871', 'anémia', 'DisGeNET', 0.4)")
      st.execute("INSERT INTO disease VALUES (1, 'Orphanet:846', 'alpha-thal', 'Monarch', NULL)")
      st.execute("INSERT INTO disease VALUES (1, 'MIM:102700', 'scid', 'DrugCentral Indication', NULL)")
      st.execute("INSERT INTO disease VALUES (1, 'DOID:1', 'tiga hit', 'JensenLab Experiment TIGA', 0.9)")
      st.execute("INSERT INTO disease VALUES (1, 'ENSP00001', 'bad id', 'DisGeNET', NULL)") // filtered in SQL
      st.execute("""CREATE TABLE drug_activity (
        target_id INT, drug VARCHAR(64), cmpd_chemblid VARCHAR(32), act_value DOUBLE,
        act_type VARCHAR(16), action_type VARCHAR(32))""")
      st.execute("INSERT INTO drug_activity VALUES (1, 'pentostatin', 'CHEMBL1234', 8.5, 'IC50', 'INHIBITOR')")
      st.execute("""CREATE TABLE cmpd_activity (
        target_id INT, cmpd_name_in_src VARCHAR(64), cmpd_id_in_src VARCHAR(32), catype VARCHAR(32),
        act_value DOUBLE, act_type VARCHAR(16), pubmed_ids VARCHAR(128))""")
      st.execute("INSERT INTO cmpd_activity VALUES (1, 'cmpd one', '5035', 'Guide to Pharmacology', 6.1, 'Ki', '11111|22222')")
      st.close()
    } finally conn.close()
    url
  }

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
