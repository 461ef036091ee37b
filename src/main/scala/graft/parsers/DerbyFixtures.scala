package graft.parsers

/** Shared embedded-Derby fixture seeders for the SQL-sourced loaders
  * (DrugCentral `dcdb`, PHAROS `tcrd`): used by their parser specs, by
  * the spec-driven full-graph builds, and by the q162 rotation staging
  * (SinkQueries — which is why this lives in main scope), all of which
  * need the databases INSIDE a staged fixture tree so
  * `Registry("DrugCentral")(spark, dir)` resolves them like any other
  * source directory. Seeding is idempotent per directory (fresh dir per
  * call site). */
object DerbyFixtures {

  /** Seed the DrugCentral fixture into `dir/dcdb`; returns the plain
    * JDBC url (no ;create — the database now exists). */
  def seedDrugCentral(dir: String): String = {
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/dcdb;create=true")
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE omop_relationship (
        struct_id INT, relationship_name VARCHAR(64), umls_cui VARCHAR(16), cui_semantic_type VARCHAR(8))""")
      st.execute("INSERT INTO omop_relationship VALUES (5, 'indication', 'C0011849', 'T047')")
      st.execute("INSERT INTO omop_relationship VALUES (5, 'contraindication', 'C0020538', NULL)")
      st.execute("INSERT INTO omop_relationship VALUES (6, 'indication', 'C0002871', 'T121')") // excluded sty
      st.execute("INSERT INTO omop_relationship VALUES (6, 'indication', NULL, NULL)")         // null cui

      st.execute("""CREATE TABLE faers (
        struct_id INT, meddra_code VARCHAR(16), llr DOUBLE, llr_threshold DOUBLE, drug_ae INT)""")
      st.execute("INSERT INTO faers VALUES (5, '10020772', 120.5, 100.0, 30)")
      st.execute("INSERT INTO faers VALUES (5, '10021428', 90.0, 100.0, 30)")  // llr below threshold
      st.execute("INSERT INTO faers VALUES (6, '10021428', 150.0, 100.0, 10)") // drug_ae <= 25

      st.execute("""CREATE TABLE act_table_full (
        struct_id INT, act_value DOUBLE, act_unit VARCHAR(16), act_type VARCHAR(16),
        act_source VARCHAR(32), act_source_url VARCHAR(128), action_type VARCHAR(32), target_id INT)""")
      st.execute("CREATE TABLE td2tc (target_id INT, component_id INT)")
      st.execute("CREATE TABLE target_component (id INT, accession VARCHAR(16))")
      st.execute("INSERT INTO act_table_full VALUES (5, 7.2, NULL, 'IC50', 'CHEMBL', NULL, 'INHIBITOR', 1)")
      st.execute("INSERT INTO act_table_full VALUES (6, 8.1, NULL, 'Kd', 'SCIENTIFIC LITERATURE', 'http://www.ncbi.nlm.nih.gov/pubmed/12345', NULL, 1)")
      st.execute("INSERT INTO td2tc VALUES (1, 11)")
      st.execute("INSERT INTO target_component VALUES (11, 'P00374')")
      st.close()
    } finally conn.close()
    s"jdbc:derby:$dir/dcdb"
  }

  /** Seed the PHAROS tcrd fixture into `dir/tcrd`; returns the url. */
  def seedPharos(dir: String): String = {
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/tcrd;create=true")
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
    s"jdbc:derby:$dir/tcrd"
  }
}
