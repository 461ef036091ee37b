package graft.normalize

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NameRes grounding against fixture-backed lookup services: first-hit
  * selection, clean miss vs api_error after retries, per-partition
  * distinct resolution. */
class NameResSpec extends SparkSpec {

  private object FixtureLookup extends NameRes.LookupService {
    override def lookup(name: String, biolinkType: String): Either[String, Option[NameRes.Hit]] =
      name match {
        case "aspirin" => Right(Some(NameRes.Hit("CHEBI:15365", "acetylsalicylic acid", 112.5)))
        case "TP53" if biolinkType == "biolink:Gene" =>
          Right(Some(NameRes.Hit("NCBIGene:7157", "TP53", 99.0)))
        case "flaky" => Left("Connection Error calling name resolution")
        case _ => Right(None)
      }
  }

  test("resolveOne: first hit, clean miss, api_error after exhausted retries") {
    val hit = NameRes.resolveOne(FixtureLookup, "aspirin", "", sleepMs = 0)
    assert(hit.curie === "CHEBI:15365" && hit.apiError === null)
    val miss = NameRes.resolveOne(FixtureLookup, "unknowncompound", "", sleepMs = 0)
    assert(miss.curie === null && miss.apiError === null)
    val err = NameRes.resolveOne(FixtureLookup, "flaky", "", retries = 2, sleepMs = 0)
    assert(err.curie === null && err.apiError != null &&
      err.apiError.contains("Connection Error"))
  }

  test("retry recovers when the service heals within the retry budget") {
    class Healing extends NameRes.LookupService {
      var calls = 0
      override def lookup(name: String, biolinkType: String) = {
        calls += 1
        if (calls < 3) Left("timeout") else Right(Some(NameRes.Hit("X:1", "x", 1.0)))
      }
    }
    val s = new Healing
    val g = NameRes.resolveOne(s, "x", "", retries = 2, sleepMs = 0)
    assert(g.curie === "X:1" && s.calls === 3)
  }

  test("ground resolves distinct (name, type) pairs distributed") {
    import spark.implicits._
    val df = Seq(
      ("aspirin", ""), ("aspirin", ""), // duplicate collapses
      ("TP53", "biolink:Gene"),
      ("TP53", ""),                     // same name, different type: distinct pair
      ("unknowncompound", "")
    ).toDF("entity_name", "entity_type")
    val out = NameRes.ground(df, "entity_name", "entity_type", FixtureLookup, sleepMs = 0)
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("biolink_type"),
        r.getAs[String]("curie"))).toSet
    assert(out === Set(
      ("aspirin", "", "CHEBI:15365"),
      ("TP53", "biolink:Gene", "NCBIGene:7157"),
      ("TP53", "", null),
      ("unknowncompound", "", null)))
  }
}
