package graft.io

import graft.SparkSpec
import graft.io.Neo4jTools.{CommandResult, CommandRunner}

/** Neo4j dump orchestration against a recording runner (the executables
  * don't exist in this sandbox — the seam is the tested surface, like the
  * SnpEff supplementation step). */
class Neo4jToolsSpec extends SparkSpec {

  private class RecordingRunner(failOn: Option[String] = None) extends CommandRunner {
    val commands = Seq.newBuilder[Seq[String]]
    val cyphers = Seq.newBuilder[String]
    override def run(cmd: Seq[String], cwd: Option[String]): CommandResult = {
      commands += cmd
      if (failOn.exists(cmd.contains)) CommandResult(1, stderr = "boom") else CommandResult(0)
    }
    override def cypher(statement: String): CommandResult = {
      cyphers += statement; CommandResult(0)
    }
    override def executableAvailable(name: String): Boolean = true
  }

  private def fixture = {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      """{"id":"HGNC:1","name":"g","category":["biolink:Gene"]}""",
      """{"id":"MONDO:1","name":"d","category":["biolink:Disease"]}""").toDS())
    val edges = spark.read.json(Seq(
      """{"subject":"HGNC:1","predicate":"biolink:related_to","object":"MONDO:1","primary_knowledge_source":"infores:test"}""").toDS())
    (nodes, edges)
  }

  test("capability check raises with the missing executables") {
    val noneAvailable = new CommandRunner {
      override def run(cmd: Seq[String], cwd: Option[String]) = CommandResult(0)
      override def cypher(statement: String) = CommandResult(0)
      override def executableAvailable(name: String) = false
    }
    val e = intercept[Neo4jTools.Neo4jUnavailable] { Neo4jTools.checkAvailable(noneAvailable) }
    assert(e.missing == Seq("neo4j", "neo4j-admin", "cypher-shell"))
  }

  test("createDump runs import -> start -> indexes -> stop -> dump in order") {
    val (nodes, edges) = fixture
    val out = java.nio.file.Files.createTempDirectory("neo4j-dump-").toString
    val runner = new RecordingRunner()
    val result = Neo4jTools.createDump(nodes, edges, out, runner)
    assert(result.success)
    val cmds = runner.commands.result()
    assert(cmds.head.take(3) == Seq("neo4j-admin", "dbms", "set-initial-password"))
    assert(cmds(1).take(4) == Seq("neo4j-admin", "database", "import", "full"))
    assert(cmds(1).exists(_.startsWith("--nodes=")))
    assert(cmds(1).contains("--delimiter=TAB"))
    assert(cmds(2) == Seq("neo4j", "start"))
    assert(cmds(3) == Seq("neo4j", "stop"))
    assert(cmds(4).take(3) == Seq("neo4j-admin", "database", "dump"))
    val cyphers = runner.cyphers.result()
    assert(cyphers.head.contains("CREATE INDEX node_name_index"))
    assert(cyphers.exists(_.contains("CONSTRAINT node_id_biolink_Gene")))
    assert(cyphers.exists(_.contains("REQUIRE n.id IS UNIQUE")))
    // the distributed CSV side really wrote files
    assert(new java.io.File(out, "nodes.csv").exists())
    assert(new java.io.File(out, "edges.csv").exists())
  }

  test("createDump fails fast on a non-zero exit") {
    val (nodes, edges) = fixture
    val out = java.nio.file.Files.createTempDirectory("neo4j-dump-").toString
    val runner = new RecordingRunner(failOn = Some("start"))
    val result = Neo4jTools.createDump(nodes, edges, out, runner)
    assert(!result.success)
    assert(result.log.last == "start: exit=1")
    assert(runner.commands.result().forall(c => !c.contains("dump")))
  }
}
