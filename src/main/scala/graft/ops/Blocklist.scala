package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast URL/domain blocklist gate — the C4 cleaning pass's list
  * filter (Raffel et al. 2020 §2.2 drops pages from a public
  * badwords/blocklist) on the URL surface. Two arms:
  *
  *  - domain arm: the capture's REGISTERED domain (eTLD+1 via
  *    [[Psl.registeredDomain]] — so listing `badsite.com` blocks
  *    `www.badsite.com` and every other subdomain through the full
  *    public-suffix precedence, wildcard/exception rules included)
  *    membership in the blocked-domain list;
  *  - substring arm: any blocked term contained in the lowercased URL
  *    (the badwords-list analog for ad/tracker/chumbox path patterns).
  *
  * Scale shape: the PSL precedence (explode + window) runs over the
  * DISTINCT host table only; the captures themselves never shuffle —
  * the blocked-host set comes back as a BROADCAST left join and the
  * term arm is a codegen'd HOF over a literal array. At 100 TB the
  * corpus-side cost is one broadcast hash join plus a map-side
  * projection; the distinct-host aggregation is the only exchange and
  * is shared infrastructure with `url_registered_domain`.
  */
object Blocklist {

  /** Fixture blocklist: one registered domain the synthetic corpus
    * actually serves (`low.example.org` — the hostword arm, so a real
    * fraction of captures block) and one PSL-EXCEPTION domain
    * (`free.wild.test`) only planted captures hit, keeping the
    * exception-beats-wildcard precedence live inside the gate. */
  val fixtureDomains: Seq[String] = Seq("low.example.org", "free.wild.test")

  /** URL substring arm — path/query patterns, lowercase. */
  val fixtureUrlTerms: Seq[String] = Seq("/order/13", "a=4")

  /** The blocked-host side artifact: PSL precedence over a host
    * universe, filtered to hosts whose registered domain (or the host
    * itself — registered_domain is null when the host IS a public
    * suffix) is listed. O(|blocked hosts|) rows — at production scale
    * this is computed ONCE per blocklist revision over the distinct-host
    * table and broadcast into every gating query (the IVF-model
    * persistence discipline), not recomputed per corpus pass. */
  def blockedHostSet(
      hosts: DataFrame,
      domains: Seq[String] = fixtureDomains,
      rules: Seq[Psl.Rule] = Psl.fixtureRules): DataFrame =
    Psl.registeredDomain(hosts, rules)
      .where(col("registered_domain").isin(domains: _*) || col("host").isin(domains: _*))
      .select("host")

  /** above this, the term arm switches from the `exists(contains)` HOF
    * (|terms| substring scans per row — fine for a handful) to the
    * [[graft.functions.MultiContainsExpr]] Aho-Corasick kernel (one
    * O(len) automaton pass, cost independent of term count — C4's real
    * badwords list is ~400 entries). Both arms are byte-substring
    * semantics; NativeExprSpec pins parity, SkewSpec pins the kernel's
    * flat cost on a term-count ladder. */
  val TermKernelThreshold = 8

  /** Adds `blocked_domain`, `blocked_term`, `keep` to a frame with
    * `host` and `url` columns, given a pre-built blocked-host set —
    * a broadcast left join plus a codegen'd term match; the captures
    * never shuffle. `broadcastHint = false` is the escape hatch for a
    * listed MEGA-domain whose observed subdomains inflate the set past
    * broadcast size: the join then shuffles on host (DEPLOY.md §4). */
  def gateWith(
      captures: DataFrame,
      blockedHosts: DataFrame,
      urlTerms: Seq[String] = fixtureUrlTerms,
      broadcastHint: Boolean = true): DataFrame = {
    val bh = blockedHosts.select(col("host"), lit(true).as("bl_dom"))
    // null terms are list junk, sanitized BEFORE either arm: the HOF's
    // three-valued exists would turn a null element into blocked_term =
    // NULL on non-matching rows (poisoning keep), and the kernel skips
    // nulls — filtering here keeps the two arms' semantics identical
    val terms = urlTerms.filter(_ != null)
    val termMatch =
      if (terms.isEmpty) lit(false)
      else if (terms.size <= TermKernelThreshold)
        exists(typedLit(terms), t => contains(lower(col("url")), t))
      else {
        graft.functions.GraftFunctions.register(captures.sparkSession)
        call_udf("multi_contains", lower(col("url")), typedLit(terms))
      }
    captures
      .join(if (broadcastHint) broadcast(bh) else bh, Seq("host"), "left")
      .withColumn("blocked_domain", coalesce(col("bl_dom"), lit(false)))
      .drop("bl_dom")
      .withColumn("blocked_term", termMatch)
      .withColumn("keep", !col("blocked_domain") && !col("blocked_term"))
  }

  /** One-call form: derives the host universe from the captures
    * themselves (one distinct-host aggregation — the only exchange). */
  def gate(
      captures: DataFrame,
      domains: Seq[String] = fixtureDomains,
      urlTerms: Seq[String] = fixtureUrlTerms,
      rules: Seq[Psl.Rule] = Psl.fixtureRules): DataFrame =
    gateWith(captures,
      blockedHostSet(captures.select("host").distinct(), domains, rules), urlTerms)
}
