package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation — the web-corpus half every crawl pipeline
  * runs before text quality even matters (RefinedWeb §3.1, FineWeb's
  * URL dedup + domain filtering): canonicalize URLs so the same page
  * fetched twice keys identically, reduce hosts to their REGISTRABLE
  * domain (the ownership unit blocklists and per-domain quality
  * priors operate on), aggregate per-domain statistics, and filter by
  * domain lists.
  *
  * Exact canonicalization semantics (replayed by the DuckDB oracle):
  * lowercase scheme and host; strip a default port (http:80 /
  * https:443 — other ports kept); empty path becomes "/"; the query
  * string drops tracking parameters (names starting `utm_`, or
  * exactly `gclid` / `fbclid` / `msclkid`), preserving the order of
  * the rest and the '?' only when something remains; fragments are
  * dropped. A string with no recognizable `scheme://host` yields NULL
  * (fail-closed — curation must not invent a key for garbage).
  *
  * Registrable domain: the public-suffix-list algorithm
  * (publicsuffix.org) over the `graft/public-suffixes.txt` classpath
  * resource — exception rules (`!www.ck`) prevail, then the LONGEST
  * matching rule (explicit rules of ANY depth, wildcard rules of any
  * base depth: `*.ck`, `*.kawasaki.jp`, `*.compute.amazonaws.com`),
  * then the implicit default `*` (last label is the suffix); the
  * registrable domain is the matched suffix plus one label. The
  * resource embeds the FULL published list (ICANN + PRIVATE
  * sections, ~9.5k rules, snapshot 2026-08) verbatim; IDN rules gain
  * punycode twins at load so hosts match in either form. A
  * deployment tracking the live PSL overwrites the resource
  * wholesale — the match chain is GENERATED from the deepest rule
  * actually present, so no code change is needed. A host that IS a public suffix
  * passes through whole rather than going NULL (grouping fail-open —
  * erring toward grouping siblings together, never toward splitting
  * one owner).
  *
  * Scale shape: everything here is per-row string work plus ONE
  * map-side-combinable groupBy for the stats — no UDFs, no window
  * over a content-derived key, one scan for 100 TB of URLs. Each rule
  * set compiles into an `InSet` literal (hash-set probe per row,
  * codegen'd), never a join. */
object Domains {

  /** Embedded fallback (the common ccTLD second levels) — used only
    * if the classpath resource is missing. */
  private val FallbackSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in", "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "com.mx", "com.ar", "com.tr",
    "com.cn", "net.cn", "org.cn", "com.tw", "com.hk", "com.sg",
    "co.za", "co.kr", "or.kr", "com.my", "co.id", "com.vn")

  /** The parsed rule sets of a PSL snapshot, keyed by how the matcher
    * probes them: exact rules by label count (k ≥ 2 — one-label
    * exacts are redundant with the implicit default `*`), wildcard
    * rules by their BASE label count (the labels after `*.`; a base
    * of k labels makes suffixes of k+1 labels), exceptions by label
    * count. Every set is sorted+deduped (InSet literal hygiene). */
  private[graft] final case class PslRules(
      exact: Map[Int, Seq[String]],
      wild: Map[Int, Seq[String]],
      exc: Map[Int, Seq[String]]) {
    /** Deepest public-suffix label count any rule can produce. */
    def maxSuffix: Int = ((exact.keys ++ wild.keys.map(_ + 1)) ++
      Seq(1)).max
    def exactAt(k: Int): Seq[String] = exact.getOrElse(k, Nil)
    def wildAt(k: Int): Seq[String] = wild.getOrElse(k, Nil)
    def excAt(k: Int): Seq[String] = exc.getOrElse(k, Nil)
    // shape accessors kept for the spec and the oracle interpolation
    def exact2: Seq[String] = exactAt(2)
    def exact3: Seq[String] = exactAt(3)
    def wild1: Seq[String] = wildAt(1)
    def wild2: Seq[String] = wildAt(2)
    def exc2: Seq[String] = excAt(2)
    def exc3: Seq[String] = excAt(3)
  }

  /** Punycode (A-label) twin of a non-ASCII rule, preserving the
    * `!` / `*.` prefix: the published list carries IDN rules in
    * U-label form (`公司.cn`) while crawl hostnames usually arrive
    * punycoded (`xn--55qx5d.cn`); keeping BOTH forms in the rule sets
    * matches either without a per-row IDN conversion. Labels that
    * java.net.IDN rejects yield no twin (the U-label original still
    * matches un-punycoded hosts). */
  private def punycodeTwin(rule: String): Option[String] = {
    if (rule.forall(_ < 128)) None
    else {
      val (prefix, body) =
        if (rule.startsWith("!")) ("!", rule.drop(1))
        else if (rule.startsWith("*.")) ("*.", rule.drop(2))
        else ("", rule)
      try {
        val a = java.net.IDN
          .toASCII(body, java.net.IDN.ALLOW_UNASSIGNED).toLowerCase
        Option.when(a.nonEmpty && a != body &&
          a.count(_ == '.') == body.count(_ == '.'))(prefix + a)
      } catch { case _: IllegalArgumentException => None }
    }
  }

  /** Parse PSL rule lines into [[PslRules]]. Every rule depth is
    * consumed: explicit rules of any label count (one-label exacts
    * dropped as redundant with the algorithm's implicit default `*`),
    * wildcards `*.base` with a base of any depth, exceptions `!rule`
    * of any depth. Non-ASCII (IDN) rules gain a punycode twin (see
    * [[punycodeTwin]]). Lines with an embedded `*` anywhere but the
    * leading label (`a.*.b` — not in the published grammar) are
    * skipped rather than crashing object init with an
    * ExceptionInInitializerError on first use. */
  private[graft] def parsePsl(lines: Iterator[String]): PslRules = {
    val rules = lines
      .map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("//"))
      .filter(l => !l.startsWith(".") && !l.endsWith("."))
      .toSeq.distinct
      .flatMap(r => r +: punycodeTwin(r).toSeq)
    def labels(r: String): Int = r.count(_ == '.') + 1
    def byDepth(s: Seq[String], minK: Int): Map[Int, Seq[String]] =
      s.groupBy(labels).collect {
        case (k, v) if k >= minK => k -> v.distinct.sorted
      }
    PslRules(
      exact = byDepth(rules.filter(r =>
        !r.contains("*") && !r.startsWith("!")), minK = 2),
      wild = byDepth(rules.filter(r => r.startsWith("*.") &&
        !r.drop(2).contains("*")).map(_.drop(2)), minK = 1),
      exc = byDepth(rules.filter(r => r.startsWith("!") &&
        !r.contains("*")).map(_.drop(1)), minK = 2))
  }

  /** PSL rules loaded from the `graft/public-suffixes.txt` resource
    * ('#' and blank lines ignored), falling back to
    * [[FallbackSuffixes]] as two-label exact rules. */
  private[graft] val Rules: PslRules = {
    val in = Option(getClass.getClassLoader
      .getResourceAsStream("graft/public-suffixes.txt"))
    in match {
      case None =>
        PslRules(Map(2 -> FallbackSuffixes.sorted), Map.empty, Map.empty)
      case Some(s) =>
        try {
          val src = scala.io.Source.fromInputStream(s, "UTF-8")
          try parsePsl(src.getLines()) finally src.close()
        } finally s.close()
    }
  }

  /** The explicit two-label suffixes of the snapshot (the common
    * case; also what the DuckDB oracle interpolates). */
  val MultiSuffixes: Seq[String] = Rules.exact2

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** host[:port] segment, lowercased (empty when the URL has no
    * scheme://host shape). */
  private def hostPortOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Lowercased hostname without the port; NULL for non-URLs. */
  def hostOf(url: Column): Column = {
    val hp = hostPortOf(url)
    when(hp === "", lit(null))
      .otherwise(regexp_replace(hp, ":\\d+$", ""))
  }

  /** Canonical form per the object scaladoc; NULL for non-URLs. */
  def canonicalUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val hp = hostPortOf(url)
    val host = regexp_replace(hp, ":\\d+$", "")
    val port = regexp_extract(hp, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // query = after the FIRST '?' that precedes any '#': a bare
    // "\\?([^#]*)" would match a '?' INSIDE the fragment and leak
    // fragment content into the canonical key
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = array_join(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p === "gclid" || p === "fbclid" ||
        p === "msclkid" || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("msclkid="))), "&")
    when(scheme === "" || host === "", lit(null)).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  private def inSet(c: Column, s: Seq[String]): Column =
    if (s.isEmpty) lit(false) else c.isin(s: _*)

  /** Registrable domain of a hostname (NULL in, NULL out) under the
    * PSL algorithm (see object scaladoc). The when-chain is GENERATED
    * from the loaded rules: exceptions prevail deepest-first (the
    * exception itself is the registrable domain — suffix is the
    * exception minus its leftmost label, plus one host label), then
    * suffix depths from the snapshot's deepest down to 2 (an exact
    * rule of s labels or a wildcard with an (s-1)-label base both
    * make an s-label suffix; registrable = last s+1 host labels, or
    * the whole host when it IS the suffix), then the implicit `*`
    * (registrable = last 2 labels). Each rule set compiles into an
    * `InSet` literal (hash-set probe per row, codegen'd) — never a
    * join. IP-address hosts (all-numeric labels) pass through whole —
    * truncating 192.168.0.1 to "0.1" would merge unrelated IPs into
    * one bogus blocklist/stats key. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    val base = when(host.isNull, lit(null))
      .when(host.rlike("^[0-9]+(\\.[0-9]+)*$"), host)
      .when(n <= 2, host)
    // exception rules prevail, deepest first
    val excd = Rules.exc.keys.toSeq.sorted.reverse.foldLeft(base) {
      (c, k) => c.when(n >= k && inSet(lastK(k), Rules.excAt(k)), lastK(k))
    }
    // longest matching rule: suffix depth s needs n >= s labels; a
    // host with exactly s labels IS the suffix (fail-open whole)
    val matched = (Rules.maxSuffix to 2 by -1).foldLeft(excd) { (c, s) =>
      val hit = (n >= s) &&
        (inSet(lastK(s), Rules.exactAt(s)) ||
          inSet(lastK(s - 1), Rules.wildAt(s - 1)))
      c.when(hit, when(n >= s + 1, lastK(s + 1)).otherwise(host))
    }
    matched.otherwise(lastK(2))
  }

  /** Per-domain corpus statistics: docs, chars, distinct canonical
    * URLs — the table a domain quality prior / blocklist review reads.
    * One map-side-combinable aggregation on the registrable domain. */
  def domainStats(docs: DataFrame, urlCol: String,
                  textCol: String): DataFrame = {
    val canon = canonicalUrl(col(urlCol))
    docs
      // host in its own projection: the generated when-chain
      // references it at every rule depth, and inlining the hostOf
      // regex tree there multiplies plan size (see urlCanon); hostOf
      // is non-cheap so CollapseProject keeps the split
      .select(hostOf(col(urlCol)).as("__h"),
        canon.as("__c"), length(col(textCol)).cast("long").as("__len"))
      .select(registrableDomain(col("__h")).as("domain"),
        col("__c"), col("__len"))
      .groupBy("domain")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("__c")).as("n_urls"),
        sum(col("__len")).cast("long").as("n_chars"))
  }

  /** Drop docs whose registrable domain is in `blocked`; docs whose
    * URL does not parse are ALSO dropped (fail closed — an
    * unattributable page cannot be cleared against a blocklist). */
  def dropDomains(docs: DataFrame, urlCol: String,
                  blocked: Seq[String]): DataFrame = {
    val d = registrableDomain(hostOf(col(urlCol)))
    docs.filter(d.isNotNull && !d.isin(blocked: _*))
  }

  /** URL-level exact dedup: keep the minimum id per canonical URL
    * (the FineWeb first pass — far cheaper than text dedup and
    * catches re-crawls that differ only in tracking params). The
    * skew-safe min-agg + semi-join shape ([[Dedup.dropExactDuplicates]]
    * on the canonical URL); unparseable URLs keep their rows (they
    * carry no dedup key). */
  def dropUrlDuplicates(docs: DataFrame, idCol: String,
                        urlCol: String): DataFrame = {
    val canon = canonicalUrl(col(urlCol))
    val keyed = docs.withColumn("__cu", canon)
    val keepers = keyed.filter(col("__cu").isNotNull)
      .groupBy(col("__cu"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    keyed.filter(col("__cu").isNull).drop("__cu")
      .unionByName(keyed.filter(col("__cu").isNotNull)
        .join(keepers, Seq(idCol), "left_semi").drop("__cu"))
  }
}
