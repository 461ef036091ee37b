package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Neo4j / Memgraph bulk-import CSV sinks (SURVEY §2.2 K3/K4).
  *
  * Reference: orion/kgx_file_converter.py —
  *  - 2-pass: pass 1 infers property types by full scan (:224-305); pass 2
  *    writes typed-header TSV with array delimiter U+001F (:307-376).
  *    Spark-first: pass 1 is free — the DataFrame schema IS the type ledger.
  *  - header style `id:ID  name:string  category:LABEL  prop:string[]`
  *    (:316-322, REQUIRED_*_PROPERTIES :13-23)
  *  - arrays joined by U+001F; booleans 'true'/'false'; null name → id;
  *    whitespace flattened (:352-375)
  *  - Memgraph edges split into one CSV per predicate with a manifest
  *    (:110-147) → `partitionBy(predicate)`.
  *
  * The `neo4j-admin database import` / index-creation orchestration stays
  * driver-side (subprocess) and is out of scope in this sandbox.
  */
object GraphCsvSink {

  val ArrayDelimiter = ""
  val OutputDelimiter = "\t"

  /** Neo4j type-name for a Spark type (mirrors the reference's inferred
    * names: string/int/float/boolean/string[]/int[]/float[]). */
  def neo4jType(dt: DataType): String = dt match {
    case StringType => "string"
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType => "float"
    case BooleanType => "boolean"
    case ArrayType(et, _) => et match {
      case StringType => "string[]"
      case ByteType | ShortType | IntegerType | LongType => "int[]"
      case FloatType | DoubleType => "float[]"
      case _ => "string[]"
    }
    case _ => "string" // structs/maps serialize to JSON strings
  }

  private val nodeSpecial = Map("id" -> "ID", "category" -> "LABEL")
  private val edgeSpecial = Map("subject" -> "START_ID", "predicate" -> "TYPE", "object" -> "END_ID")

  /** The typed header line, e.g. `id:ID\tname:string\tcategory:LABEL`.
    * biolink: prefixes are stripped from header names (ref :319). */
  def header(df: DataFrame, special: Map[String, String]): String =
    df.schema.fields.map { f =>
      val t = special.getOrElse(f.name, neo4jType(f.dataType))
      s"${f.name.stripPrefix("biolink:")}:$t"
    }.mkString(OutputDelimiter)

  private def flattenWs(c: Column): Column = regexp_replace(c, "[\\n\\r\\t]+", " ")

  /** Format one column to its CSV cell (ref :352-375). */
  private def cell(df: DataFrame, name: String): Column = {
    val f = df.schema(name)
    f.dataType match {
      case ArrayType(StringType, _) =>
        array_join(transform(col(name), flattenWs(_)), ArrayDelimiter)
      case ArrayType(_: NumericType, _) =>
        array_join(transform(col(name), _.cast("string")), ArrayDelimiter)
      case ArrayType(_, _) | _: StructType | _: MapType =>
        to_json(col(name)) // neo4j can't hold nested values; compact JSON
      case BooleanType => when(col(name), "true").otherwise("false")
      case StringType if name == "name" && df.columns.contains("id") =>
        flattenWs(coalesce(col(name), col("id"))) // null name → id (ref :354-356)
      case StringType => flattenWs(col(name))
      case _ => col(name).cast("string")
    }
  }

  private def writeCsv(df: DataFrame, formatted: DataFrame, path: String,
                       headerLine: String, partitionCols: Seq[String]): Unit = {
    val w = formatted.write.mode(SaveMode.Overwrite)
      .option("sep", OutputDelimiter)
      .option("emptyValue", "")
      .option("nullValue", "")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).csv(path)
    // header goes in a sidecar (neo4j-admin import accepts a separate
    // header file; one header for N part files keeps the write parallel)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_header.csv"), headerLine + "\n")
  }

  /** K3 — nodes CSV with typed header. */
  def writeNeo4jNodes(nodes: DataFrame, path: String,
                      ignore: Set[String] = Set.empty): Unit = {
    val df = nodes.drop(ignore.toSeq: _*)
    val formatted = df.select(df.columns.map(c => cell(df, c).as(c)): _*)
    writeCsv(df, formatted, path, header(df, nodeSpecial), Nil)
  }

  /** K3 — edges CSV with typed header. */
  def writeNeo4jEdges(edges: DataFrame, path: String,
                      ignore: Set[String] = Set.empty): Unit = {
    val df = edges.drop(ignore.toSeq: _*)
    val formatted = df.select(df.columns.map(c => cell(df, c).as(c)): _*)
    writeCsv(df, formatted, path, header(df, edgeSpecial), Nil)
  }

  /** K4 — Memgraph edges: one directory per predicate via partitionBy (the
    * distributed analog of the reference's per-predicate file handles),
    * plus a manifest of the predicates present. */
  def writeMemgraphEdges(edges: DataFrame, path: String): Unit = {
    val df = edges.withColumn("_predicate_dir",
      regexp_replace(col("predicate"), ":", "_"))
    val formatted = df.select(
      (df.columns.filterNot(_ == "_predicate_dir").map(c => cell(df, c).as(c))
        :+ col("_predicate_dir")): _*)
    writeCsv(df, formatted, path, header(df.drop("_predicate_dir"), edgeSpecial),
      Seq("_predicate_dir"))
    val predicates = edges.select(regexp_replace(col("predicate"), ":", "_"))
      .distinct().collect().map(_.getString(0)).sorted
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_manifest.txt"), predicates.mkString("", "\n", "\n"))
  }

  /** Memgraph index cypher (ref :56-87): NamedThing name index + per-label
    * id indexes. Labels come from one distinct pass. */
  def memgraphIndexCypher(nodes: DataFrame): String = {
    val labels = nodes.select(explode(col("category")).as("l")).distinct()
      .collect().map(_.getString(0)).sorted
    ("CREATE INDEX ON :`biolink:NamedThing`(name);" +:
      labels.map(l => s"CREATE INDEX ON :`$l`(id);")).mkString("\n") + "\n"
  }

  /** K4 — full Memgraph dump bundle (ref orion/memgraph_tools.py:8-48):
    * `memgraph_{id}[_{version}]_nodes.csv` + `..._indexes.cypher` +
    * per-predicate edge csvs + manifest, each step skipped when its output
    * already exists (the reference's idempotent re-run behavior). */
  def createMemgraphDump(nodes: DataFrame, edges: DataFrame, outputDir: String,
                         graphId: String = "graph", releaseVersion: String = "",
                         nodeIgnore: Set[String] = Set.empty,
                         edgeIgnore: Set[String] = Set.empty): Unit = {
    val subName = if (releaseVersion.nonEmpty) s"${graphId}_$releaseVersion" else graphId
    val nodesCsv = java.nio.file.Paths.get(outputDir, s"memgraph_${subName}_nodes.csv")
    val indexCypher = java.nio.file.Paths.get(outputDir, s"memgraph_${subName}_indexes.cypher")
    val edgesDir = java.nio.file.Paths.get(outputDir, s"memgraph_${subName}_edges.csv")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outputDir))
    if (!java.nio.file.Files.exists(nodesCsv))
      writeNeo4jNodes(nodes.drop(nodeIgnore.toSeq: _*), nodesCsv.toString)
    if (!java.nio.file.Files.exists(indexCypher))
      java.nio.file.Files.writeString(indexCypher, memgraphIndexCypher(nodes))
    if (!java.nio.file.Files.exists(edgesDir.resolve("_manifest.txt")))
      writeMemgraphEdges(edges.drop(edgeIgnore.toSeq: _*), edgesDir.toString)
  }
}
