package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything leaves the corpus
  * (emails, phone numbers, IPv4 addresses).
  *
  * Patterns are written in the common subset of Java regex (Spark) and
  * RE2 (DuckDB): no backreferences, no lookaround, `\b`/`\d` only — so
  * the SQL twins in [[graft.queries.SamplingQueries]] are literal
  * re-uses of the same strings and the oracle hash pins the exact
  * match semantics.
  *
  * Scale shape: pure codegen'd string expressions (`regexp_count`,
  * `regexp_replace`) — no UDFs, no shuffle; a scan-local map at any
  * corpus size.
  */
object Pii {

  /** user@host.tld — conservative, no quoted local parts. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style +1-XXX-XXXX as emitted by the derived fixture column;
    * real deployments would widen this list, the machinery is the same. */
  val phoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 (word-bounded; does not validate octet range —
    * over-redaction is the safe failure mode for PII). */
  val ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(emailRe))
  def countPhones(text: Column): Column = regexp_count(text, lit(phoneRe))
  def countIpv4s(text: Column): Column = regexp_count(text, lit(ipv4Re))

  /** Replace every PII hit with a typed placeholder. Order matters for
    * overlapping classes (an email's host contains dots and digits), so
    * redaction applies email → phone → ipv4; the SQL twin uses the same
    * order. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "[EMAIL]")
    val p = regexp_replace(e, phoneRe, "[PHONE]")
    regexp_replace(p, ipv4Re, "[IP]")
  }
}
