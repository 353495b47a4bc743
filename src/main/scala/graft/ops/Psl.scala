package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public-suffix-list registered-domain (eTLD+1) extraction — the
  * publicsuffix.org algorithm every crawler, indexer, and domain-level
  * query surface depends on (the reference's SURT domain queries group
  * by registrable domain; SURVEY §2.9 `matchType=domain`). Naive
  * "last two labels" is wrong for ccSLDs (`example.co.uk`), wildcard
  * rules (`*.ck`), and exceptions (`!www.ck`); this implements the real
  * precedence:
  *
  *  1. a rule matches when its labels suffix-match the host's
  *     (`*` matches exactly one label);
  *  2. a matching EXCEPTION rule prevails unconditionally, and its
  *     public suffix is the rule minus its leftmost label;
  *  3. otherwise the matching rule with the MOST labels prevails;
  *  4. no match → default rule `*` (the top label is the suffix).
  *
  * Registered domain = public suffix + one more host label; a host that
  * IS a public suffix has none (null).
  *
  * Plan shape at 100 TB: run this on the DISTINCT host table (O(hosts),
  * orders of magnitude below the capture corpus) and broadcast the
  * resulting host→domain map onto captures. Inside: each host explodes
  * into ≤ |labels| suffix candidates (bounded ~6–10), the rule table is
  * a broadcast hash join on BOTH match forms (exact pattern and the
  * first-label-wildcarded form — two equi legs unioned, never an OR
  * nested-loop), and the prevailing rule is one row_number window over
  * host. No corpus-sized shuffle anywhere.
  */
object Psl {

  /** `(pattern, isException)` — patterns lowercase, `!` already split
    * out. rule_n counts labels (`*` counts, per the PSL algorithm). */
  type Rule = (String, Boolean)

  /** Fixture rule set: exercises plain TLD, multi-label suffix (the
    * `co.uk` class), wildcard, exception-under-wildcard, and the
    * implicit default `*` (hosts under `.zz` match nothing). */
  val fixtureRules: Seq[Rule] = Seq(
    ("org", false),
    ("example.org", false),
    ("test", false),
    ("city.test", false),
    ("*.wild.test", false),
    ("free.wild.test", true))

  /** Planted hosts driving every precedence arm (the synthetic CDX
    * corpus alone only hits the multi-label-suffix arm). */
  val fixtureHosts: Seq[String] = Seq(
    "a.b.wild.test",   // wildcard: ps = b.wild.test, reg = a.b.wild.test
    "b.wild.test",     // host IS a wildcard public suffix -> reg null
    "free.wild.test",  // exception beats wildcard: ps = wild.test
    "sub.free.wild.test", // exception via proper suffix
    "x.city.test",     // ccSLD-style 2-label suffix
    "city.test",       // host IS a listed suffix -> reg null
    "unknown.zz",      // no rule -> default *: ps = zz
    "zz")              // single label, no rule -> reg null

  /** `(host, public_suffix, registered_domain)` for each input host
    * (one column `host`, assumed lowercase ASCII — compose with
    * [[graft.functions.Surt]] IDN/case normalization upstream). */
  def registeredDomain(hosts: DataFrame, rules: Seq[Rule] = fixtureRules): DataFrame = {
    val s = hosts.sparkSession
    import s.implicits._

    val rdf = rules.map { case (p, exc) =>
      val n = p.count(_ == '.') + 1
      (p, if (exc) 1 else 0, n, if (exc) n - 1 else n)
    }.toDF("pattern", "is_exc", "rule_n", "ps_n")

    val lab = hosts.select(col("host"), split(col("host"), "\\.").as("labels"))
      .withColumn("n", size(col("labels")))
    // suffix candidates: i-th (1-based) = labels[i..n]; the wildcarded
    // form replaces the candidate's first label with '*'
    val cand = lab
      .select(col("host"), col("labels"), col("n"),
        explode(sequence(lit(1), col("n"))).as("i"))
      .select(col("host"), col("n"), col("i"),
        array_join(slice(col("labels"), col("i"), col("n") - col("i") + 1), ".").as("suffix"),
        when(col("i") < col("n"),
          concat(lit("*."),
            array_join(slice(col("labels"), col("i") + 1, col("n") - col("i")), ".")))
          .as("wild"))

    val exact = cand.join(broadcast(rdf), col("suffix") === col("pattern"))
    val wildm = cand.where(col("wild").isNotNull)
      .join(broadcast(rdf), col("wild") === col("pattern"))
    val m = exact.unionByName(wildm)
      .select("host", "is_exc", "rule_n", "ps_n", "pattern")

    // prevailing rule: exception > most labels; pattern desc is a pure
    // determinism tiebreak (equal-length prevailing rules agree on ps_n)
    val w = Window.partitionBy("host")
      .orderBy(col("is_exc").desc, col("rule_n").desc, col("pattern").desc)
    val best = m.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("host", "ps_n")

    lab.join(best, Seq("host"), "left")
      .withColumn("k", coalesce(col("ps_n"), lit(1)))
      .select(col("host"),
        array_join(slice(col("labels"), col("n") - col("k") + 1, col("k")), ".")
          .as("public_suffix"),
        when(col("n") > col("k"),
          array_join(slice(col("labels"), col("n") - col("k"), col("k") + 1), "."))
          .as("registered_domain"))
  }

  /** The rule set as a DuckDB VALUES CTE body `(pattern, is_exc, rule_n,
    * ps_n)`. */
  def rulesDuck(rules: Seq[Rule] = fixtureRules): String =
    rules.map { case (p, exc) =>
      val n = p.count(_ == '.') + 1
      s"('$p', ${if (exc) 1 else 0}, $n, ${if (exc) n - 1 else n})"
    }.mkString(", ")

  /** The planted hosts as a DuckDB VALUES list. */
  def hostsDuck: String = fixtureHosts.map(h => s"('$h')").mkString(", ")
}
