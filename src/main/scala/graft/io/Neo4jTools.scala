package graft.io

import org.apache.spark.sql.DataFrame

/** Neo4j/Memgraph dump orchestration (SURVEY §2.2 K3/K4 tail).
  *
  * Reference: orion/neo4j_tools.py — capability check (:26-33), CSV import
  * via `neo4j-admin database import full` (:68-85), start/stop/password
  * (:112-170,181-233), index creation (:181-233), dump (:255-338) and the
  * create_neo4j_dump flow (:344-420): import → start → wait → indexes →
  * stop → dump → rename.
  *
  * The external executables are behind a pluggable [[CommandRunner]]:
  * production uses [[ProcessRunner]] (real subprocesses), tests use a
  * recording runner — same seam pattern as the SnpEff supplementation
  * step, since neither tool exists in this sandbox. The Spark side (CSV
  * writing, distributed) lives in [[GraphCsvSink]]; everything here is
  * driver-side orchestration of a single-node database tool, which is
  * inherently serial in any engine.
  */
object Neo4jTools {

  /** Executables the reference requires on PATH (neo4j_tools.py:20-24). */
  val requiredExecutables: Seq[String] = Seq("neo4j", "neo4j-admin", "cypher-shell")

  final case class CommandResult(exitCode: Int, stdout: String = "", stderr: String = "")

  trait CommandRunner {
    def run(cmd: Seq[String], cwd: Option[String] = None): CommandResult
    /** cypher statements executed against the running instance. */
    def cypher(statement: String): CommandResult
    def executableAvailable(name: String): Boolean
  }

  /** Real subprocess runner (cypher via cypher-shell). */
  final class ProcessRunner(password: String = "graft-password") extends CommandRunner {
    override def run(cmd: Seq[String], cwd: Option[String]): CommandResult = {
      val pb = new ProcessBuilder(cmd: _*)
      cwd.foreach(d => pb.directory(new java.io.File(d)))
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes())
      val err = new String(p.getErrorStream.readAllBytes())
      CommandResult(p.waitFor(), out, err)
    }
    override def cypher(statement: String): CommandResult =
      run(Seq("cypher-shell", "-u", "neo4j", "-p", password, statement))
    override def executableAvailable(name: String): Boolean =
      sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
        .exists(dir => new java.io.File(dir, name).canExecute)
  }

  final case class Neo4jUnavailable(missing: Seq[String]) extends RuntimeException(
    s"Neo4j is required for this operation but the following were not found: ${missing.mkString(", ")}. " +
      "Graph specs that produce a Neo4j dump require a Neo4j installation.")

  /** Capability check (check_neo4j_available, neo4j_tools.py:26-33). */
  def checkAvailable(runner: CommandRunner): Unit = {
    val missing = requiredExecutables.filterNot(runner.executableAvailable)
    if (missing.nonEmpty) throw Neo4jUnavailable(missing)
  }

  def importCsvCommand(nodesCsv: String, edgesCsv: String): Seq[String] =
    Seq("neo4j-admin", "database", "import", "full",
      s"--nodes=$nodesCsv", s"--relationships=$edgesCsv",
      "--delimiter=TAB", "--array-delimiter=U+001F", "--overwrite-destination=true")

  def setPasswordCommand(password: String): Seq[String] =
    Seq("neo4j-admin", "dbms", "set-initial-password", password)

  def startCommand: Seq[String] = Seq("neo4j", "start")
  def stopCommand: Seq[String] = Seq("neo4j", "stop")

  def dumpCommand(outputDir: String): Seq[String] =
    Seq("neo4j-admin", "database", "dump", "neo4j", s"--to-path=$outputDir",
      "--overwrite-destination=true")

  /** Index cypher: node-name index on NamedThing + a unique-id constraint
    * per label (add_db_indexes, neo4j_tools.py:181-233). */
  def indexStatements(labels: Seq[String]): Seq[String] = {
    val nameIndex = "CREATE INDEX node_name_index FOR (n:`biolink:NamedThing`) ON (n.name)"
    val idConstraints = labels.map { label =>
      val indexName = s"node_id_${label.replace(":", "_")}"
      s"CREATE CONSTRAINT $indexName FOR (n:`$label`) REQUIRE n.id IS UNIQUE"
    }
    nameIndex +: idConstraints
  }

  final case class DumpResult(success: Boolean, log: Seq[String])

  /** create_neo4j_dump (neo4j_tools.py:344-420): write header CSVs with
    * the distributed sink, then import → password → start → indexes →
    * stop → dump. Fails fast on the first non-zero exit. */
  def createDump(nodes: DataFrame, edges: DataFrame, outputDir: String,
                 runner: CommandRunner,
                 password: String = "graft-password"): DumpResult = {
    checkAvailable(runner)
    val log = Seq.newBuilder[String]

    GraphCsvSink.writeNeo4jNodes(nodes, s"$outputDir/nodes.csv")
    GraphCsvSink.writeNeo4jEdges(edges, s"$outputDir/edges.csv")
    log += s"wrote neo4j csv files to $outputDir"

    val labels = nodes.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("category")).as("l"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

    val steps: Seq[(String, () => CommandResult)] = Seq(
      "set-password" -> (() => runner.run(setPasswordCommand(password))),
      "import" -> (() => runner.run(importCsvCommand(
        s"$outputDir/nodes.csv", s"$outputDir/edges.csv"), cwd = Some(outputDir))),
      "start" -> (() => runner.run(startCommand))) ++
      indexStatements(labels).zipWithIndex.map { case (st, i) =>
        s"index-$i" -> (() => runner.cypher(st))
      } ++ Seq(
      "stop" -> (() => runner.run(stopCommand)),
      "dump" -> (() => runner.run(dumpCommand(outputDir))))

    for ((name, step) <- steps) {
      val r = step()
      log += s"$name: exit=${r.exitCode}"
      if (r.exitCode != 0) return DumpResult(success = false, log.result())
    }
    DumpResult(success = true, log.result())
  }
}
