package graft.sources

import graft.SparkSpec
import graft.extract.Extractor.{EdgeRule, Extraction}
import org.apache.spark.sql.functions._

/** S4 JDBC smoke against embedded Derby (ships with Spark — no network,
  * no external service), mirroring sql_extract (orion/extractor.py:68-82). */
class SqlSourceSpec extends SparkSpec {

  private def derbyUrl(dir: String) = s"jdbc:derby:$dir/graftdb;create=true"

  private def seedDb(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE gene_disease (gene_id VARCHAR(32), gene_name VARCHAR(64), disease_id VARCHAR(32), score DOUBLE)")
      st.execute("INSERT INTO gene_disease VALUES ('NCBIGene:100', 'ADA', 'MONDO:0001', 0.9)")
      st.execute("INSERT INTO gene_disease VALUES ('NCBIGene:200', 'BRCA1', 'MONDO:0002', 0.7)")
      st.execute("INSERT INTO gene_disease VALUES ('NCBIGene:300', 'TP53', 'MONDO:0001', 0.2)")
      st.close()
    } finally conn.close()
  }

  test("sql_extract shape: JDBC query -> extraction -> nodes/edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-").toString
    val url = derbyUrl(dir)
    seedDb(url)

    val g = SqlSource.sqlExtract(spark, url,
      "SELECT gene_id, gene_name, disease_id, score FROM gene_disease WHERE score >= 0.5",
      Extraction(
        subjectId = col("GENE_ID"),
        subjectName = col("GENE_NAME"),
        subjectCategories = Seq("biolink:Gene"),
        objectId = col("DISEASE_ID"),
        objectCategories = Seq("biolink:Disease"),
        edges = Seq(EdgeRule(
          predicate = lit("biolink:gene_associated_with_condition"),
          properties = Map("score" -> col("SCORE")))),
        primaryKnowledgeSource = "infores:sql-fixture"))

    assert(g.edges.count() == 2) // score filter pushed into the DB query
    assert(g.nodes.count() == 4) // 2 genes + 2 diseases
    val e = g.edges.orderBy(col("subject")).head()
    assert(e.getAs[String]("subject") == "NCBIGene:100")
    assert(e.getAs[String]("object") == "MONDO:0001")
    assert(e.getAs[Double]("score") == 0.9)
  }

  test("partitioned JDBC read fans out over ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-").toString
    val url = derbyUrl(dir)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE nums (id INT, v VARCHAR(8))")
      (1 to 100).foreach(i => st.execute(s"INSERT INTO nums VALUES ($i, 'v$i')"))
      st.close()
    } finally conn.close()

    val df = SqlSource.readQueryPartitioned(spark, url,
      "SELECT id, v FROM nums", "id", 1, 100, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum(col("ID"))).head().getLong(0) == 5050)
  }
}
