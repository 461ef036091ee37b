package graft

import java.nio.file.{Files, Paths}

/** CLI front-door commands (O6), incl. the orion-ingest-shaped `parse`. */
class CliSpec extends SparkSpec {

  test("parse command runs a registered parser to KGX jsonl") {
    val out = Files.createTempDirectory("cli-parse-").toString
    Cli.run(spark, Array("parse", "HGNC", "src/test/resources/parsers/hgnc", out))
    val nodes = spark.read.json(s"$out/source_nodes.jsonl")
    val edges = spark.read.json(s"$out/source_edges.jsonl")
    assert(nodes.count() == 7 && edges.count() == 4)
  }

  test("curate command redacts, scores, splits, and partitions by split") {
    val out = Files.createTempDirectory("cli-curate-").toString
    Cli.run(spark, Array("curate", s"$sf/documents.parquet", out))
    val curated = spark.read.parquet(out)
    import org.apache.spark.sql.functions._
    assert(curated.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    assert(curated.columns.toSet.contains("quality") &&
      curated.columns.toSet.contains("clf_score") &&
      curated.columns.toSet.contains("detected_lang") &&
      curated.columns.toSet.contains("n_tokens") &&
      curated.columns.toSet.contains("split") &&
      curated.columns.toSet.contains("shard") &&
      curated.columns.toSet.contains("seq"))
    val splits = curated.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val")) && splits.contains("train"))
    // partitioned layout: split=.../shard=... directories on disk
    assert(Files.list(Paths.get(out)).toArray.map(_.toString)
      .exists(_.contains("split=train")))
    assert(Files.list(Paths.get(s"$out/split=train")).toArray.map(_.toString)
      .exists(_.contains("shard=")))
    // classifier scores ride the original text and land in (-1, 1)
    val clf = curated.agg(min("clf_score"), max("clf_score")).head()
    assert(clf.getDouble(0) > -1.0 && clf.getDouble(1) < 1.0)
  }

  test("quality command reports per-column completeness and key uniqueness") {
    val out = Files.createTempDirectory("cli-quality-").toString
    Cli.run(spark, Array("quality", s"$sf/documents.parquet", "doc_id", out))
    val report = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val docCols = spark.read.parquet(s"$sf/documents.parquet").columns.toSet
    docCols.foreach(c => assert(report.contains(s"completeness_$c")))
    assert(report("unique_doc_id") == ((1.0, true)))
    assert(report("completeness_doc_id") == ((1.0, true)))
  }

  test("unknown source and unknown command both fail clearly") {
    intercept[IllegalArgumentException] {
      Cli.run(spark, Array("parse", "NotASource", "/tmp", "/tmp/out"))
    }
    intercept[IllegalArgumentException] { Cli.run(spark, Array("frobnicate")) }
  }
}
