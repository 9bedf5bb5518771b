package graft

import graft.llm.Domains
import org.apache.spark.sql.functions._

/** Pins [[Domains]] — URL canonicalization, registrable-domain
  * extraction, domain blocklisting and URL-level dedup. */
class DomainsSpec extends SparkSuite {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Domains.canonicalUrl(col("u"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("canonicalization: case, ports, tracking params, fragments") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b?utm_source=x&q=1#frag")
      === Seq("https://www.example.com/A/b?q=1"))
    assert(canon("http://host.org:80/") === Seq("http://host.org/"))
    assert(canon("http://host.org:8080/x") ===
      Seq("http://host.org:8080/x")) // non-default port kept
    assert(canon("https://a.de") === Seq("https://a.de/")) // empty path
    assert(canon("https://a.de?utm_campaign=z&gclid=123") ===
      Seq("https://a.de/")) // tracking-only query drops the '?'
    assert(canon("https://a.de/p?ref=home&utm_x=1&page=2") ===
      Seq("https://a.de/p?ref=home&page=2")) // order preserved
    assert(canon("not a url", "ftp//missing.scheme", "") ===
      Seq(null, null, null))
    // a '?' INSIDE the fragment is fragment content, not a query
    assert(canon("https://a.com/p#frag?x=1") === Seq("https://a.com/p"))
    assert(canon("https://a.com/p?q=1#frag?x=2") ===
      Seq("https://a.com/p?q=1"))
  }

  test("IP hosts pass through registrableDomain whole") {
    val got = Seq("192.168.0.1", "10.0.0.7", "8.8.8.8")
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("192.168.0.1", "10.0.0.7", "8.8.8.8"))
  }

  test("registrable domain: two labels, multi-part suffixes, bare hosts") {
    val got = Seq("www.example.co.uk", "a.b.c.example.com", "xy.com",
      "localhost", "news.example.com.au", "sub.deep.org.uk")
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.co.uk", "example.com", "xy.com",
      "localhost", "example.com.au", "deep.org.uk"))
  }

  test("PSL snapshot: suffixes beyond the old 38-entry fallback " +
    "resolve the registrable domain, not the suffix itself") {
    // the r10 gap: hosts under unlisted multi-part suffixes collapsed
    // to the suffix, so 'badsite.com.pl' never matched a blocklist
    val got = Seq("www.badsite.com.pl", "shop.example.co.il",
      "news.example.com.ua", "a.b.example.co.th", "x.example.com.ng",
      "portal.example.go.th", "sub.example.ca.us", "city.example.qc.ca",
      "deep.example.com.eg", "www.example.gob.mx")
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("badsite.com.pl", "example.co.il",
      "example.com.ua", "example.co.th", "example.com.ng",
      "example.go.th", "example.ca.us", "example.qc.ca",
      "example.com.eg", "example.gob.mx"))
    // resource loaded (not the fallback), well-formed, deduped, sorted
    assert(Domains.MultiSuffixes.size > 500)
    assert(Domains.MultiSuffixes === Domains.MultiSuffixes.distinct.sorted)
    assert(Domains.MultiSuffixes.forall(_.count(_ == '.') == 1))
    // and a blocklist keyed on the registrable domain now matches
    val docs = Seq((1L, "https://www.badsite.com.pl/x"),
      (2L, "https://fine.example.com.pl/y")).toDF("doc_id", "url")
    val kept = Domains.dropDomains(docs, "url", Seq("badsite.com.pl"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L))
  }

  test("PSL wildcard, exception, and three-label rules: full " +
    "algorithm semantics (exception prevails, longest match wins)") {
    val cases = Seq(
      // *.ck: any second level under ck is a registration point
      "foo.bar.ck" -> "foo.bar.ck",
      "a.foo.bar.ck" -> "foo.bar.ck",
      // !www.ck: the exception IS the registrable domain
      "x.www.ck" -> "www.ck",
      "deep.x.www.ck" -> "www.ck",
      "www.ck" -> "www.ck", // host == exception: passthrough, same key
      // *.kawasaki.jp: two-label wildcard base -> suffix of 3 labels
      "blog.foo.kawasaki.jp" -> "blog.foo.kawasaki.jp",
      "a.blog.foo.kawasaki.jp" -> "blog.foo.kawasaki.jp",
      // !city.kawasaki.jp prevails over *.kawasaki.jp
      "x.city.kawasaki.jp" -> "city.kawasaki.jp",
      "deep.x.city.kawasaki.jp" -> "city.kawasaki.jp",
      // three-label exact rule beats the two-label edu.au rule
      "www.school.act.edu.au" -> "school.act.edu.au",
      "school.act.edu.au" -> "school.act.edu.au",
      // two-label edu.au still governs non-state labels
      "foo.edu.au" -> "foo.edu.au",
      "www.foo.edu.au" -> "foo.edu.au",
      // a host that IS a public suffix passes through whole
      // (grouping fail-open, documented)
      "foo.kawasaki.jp" -> "foo.kawasaki.jp",
      "act.edu.au" -> "act.edu.au",
      // other wildcard TLDs from the snapshot: *.np makes example.np
      // itself a public suffix, so registrable = suffix + 1 label
      "shop.example.np" -> "shop.example.np",
      "x.gov.bd" -> "x.gov.bd",
      "a.x.gov.bd" -> "x.gov.bd")
    val got = cases.map(_._1)
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("deep PSL rules (private-section sample): 3- and 4-label " +
    "wildcard bases, 3-label exacts, 2-label platform suffixes") {
    val cases = Seq(
      // *.compute.amazonaws.com: 4-label suffix; a 5-label host is
      // exactly suffix + 1 (the EC2 public-hostname shape)
      "ec2-1-2-3-4.us-west-2.compute.amazonaws.com" ->
        "ec2-1-2-3-4.us-west-2.compute.amazonaws.com",
      "x.ec2-1-2-3-4.us-west-2.compute.amazonaws.com" ->
        "ec2-1-2-3-4.us-west-2.compute.amazonaws.com",
      // a host that IS the (wildcard-made) suffix passes through
      "us-west-2.compute.amazonaws.com" ->
        "us-west-2.compute.amazonaws.com",
      // *.compute.amazonaws.com.cn: 5-label suffix via a 4-label base
      "a.b.cn-north-1.compute.amazonaws.com.cn" ->
        "b.cn-north-1.compute.amazonaws.com.cn",
      // 3-label exact: s3.amazonaws.com (bucket-hosted sites)
      "mybucket.s3.amazonaws.com" -> "mybucket.s3.amazonaws.com",
      "x.mybucket.s3.amazonaws.com" -> "mybucket.s3.amazonaws.com",
      // 2-label private platform suffixes group per tenant
      "foo.blogspot.com" -> "foo.blogspot.com",
      "www.foo.blogspot.com" -> "foo.blogspot.com",
      "team.github.io" -> "team.github.io",
      "a.team.github.io" -> "team.github.io",
      // amazonaws.com itself carries no 2-label rule: implicit `*`
      "foo.amazonaws.com" -> "amazonaws.com")
    val got = cases.map(_._1)
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("PSL snapshot invariants: rule grammar, lowercase, no dupes, " +
    "exceptions covered by wildcards, full upstream list embedded") {
    val src = scala.io.Source.fromInputStream(
      getClass.getClassLoader
        .getResourceAsStream("graft/public-suffixes.txt"), "UTF-8")
    val lines = try src.getLines().map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") ||
        l.startsWith("//")).toSeq
    finally src.close()
    // one rule per line, PSL grammar (unicode labels allowed — the
    // upstream list carries IDN rules in U-label form), lowercase —
    // a stray char, uppercase, or trailing dot fails
    // \p{M}: scripts like Bengali spell labels with combining marks
    val rule =
      "^(!|\\*\\.)?[\\p{L}\\p{M}\\p{N}-]+(\\.[\\p{L}\\p{M}\\p{N}-]+){0,4}$".r
    for (l <- lines)
      assert(rule.matches(l), s"malformed PSL rule line: '$l'")
    assert(lines.forall(l => l == l.toLowerCase), "uppercase PSL rule")
    assert(lines === lines.distinct, "duplicate PSL rules")
    // the FULL upstream list (ICANN + PRIVATE), not a sample
    assert(lines.size >= 9500, s"expected the full list, got ${lines.size}")
    assert(lines.count(_.startsWith("*.")) >= 100)
    assert(lines.count(_.exists(_ > 127)) >= 400,
      "IDN (U-label) rules missing from the snapshot")
    // structural consistency: every exception must sit under a
    // matching wildcard rule (catches an exception whose wildcard
    // was dropped, which would silently change grouping)
    val wilds = lines.filter(_.startsWith("*.")).map(_.drop(2)).toSet
    for (e <- lines.filter(_.startsWith("!"))) {
      val base = e.drop(1).split("\\.", 2)(1)
      assert(wilds.contains(base),
        s"exception $e has no matching wildcard *.$base")
    }
    // parsed rule sets see the shapes they expect
    val r = Domains.Rules
    assert(r.exact2.contains("co.uk") && r.exact2.contains("com.au"))
    assert(r.exact2.contains("blogspot.com") && r.exact2.contains("github.io"))
    assert(r.exact2.contains("gitlab.io") && r.exact2.contains("pages.dev"))
    assert(r.exact3.contains("act.edu.au") && r.exact3.contains("wa.gov.au"))
    assert(r.exact3.contains("s3.amazonaws.com"))
    assert(r.wild1.contains("ck") && r.wild1.contains("np"))
    assert(r.wild2.contains("kawasaki.jp") && r.wild2.contains("kobe.jp"))
    assert(r.wildAt(3).contains("compute.amazonaws.com"))
    assert(r.wildAt(4).contains("compute.amazonaws.com.cn"))
    assert(r.maxSuffix === 5)
    assert(r.exc2 === Seq("www.ck"))
    assert(r.exc3.contains("city.kawasaki.jp") &&
      r.exc3.contains("city.yokohama.jp"))
    // IDN rules present in BOTH forms: the upstream U-label and the
    // loader-added punycode twin (公司.cn == xn--55qx5d.cn)
    assert(r.exact2.contains("公司.cn") && r.exact2.contains("xn--55qx5d.cn"))
    // every parsed set is sorted+deduped (InSet literal hygiene)
    for (s <- (r.exact.values ++ r.wild.values ++ r.exc.values))
      assert(s === s.distinct.sorted)
  }

  test("full-list registrable domains: long-tail ICANN + private " +
    "platform suffixes beyond the old sampled snapshot") {
    val cases = Seq(
      // private-section platform suffixes absent from the r12 sample
      "team.gitlab.io" -> "team.gitlab.io",
      "a.team.gitlab.io" -> "team.gitlab.io",
      "site.pages.dev" -> "site.pages.dev",
      "shop.myshopify.com" -> "shop.myshopify.com",
      // long-tail ICANN ccTLD registration points
      "www.example.co.bw" -> "example.co.bw",
      "x.example.gov.mn" -> "example.gov.mn",
      // IDN suffix, both U-label and punycoded host forms
      "example.公司.cn" -> "example.公司.cn",
      "a.example.公司.cn" -> "example.公司.cn",
      "example.xn--55qx5d.cn" -> "example.xn--55qx5d.cn",
      "a.example.xn--55qx5d.cn" -> "example.xn--55qx5d.cn")
    val got = cases.map(_._1)
      .toDF("h").select(Domains.registrableDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("full-snapshot when-chain: whole-stage codegen compiles under " +
    "the Janino method limit, rule sets probe as InSet, not OR-chains") {
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    // pure projection (no exchange → no AQE wrapper) over a
    // non-foldable column (a LocalRelation of literals would be
    // constant-folded away at optimize time, testing nothing):
    // exactly the generated when-chain over the FULL ~9.5k snapshot
    val docs = spark.range(1).select(concat(lit("https://www.example"),
      col("id"), lit(".co.uk/x")).as("url"))
    val q = docs.select(
      Domains.registrableDomain(Domains.hostOf(col("url"))).as("domain"))
    val plan = q.queryExecution.executedPlan
    // the big literal lists must have been converted to hash-set
    // probes (OptimizeIn → InSet), never kept as thousand-way ORs
    val projs = plan.collect { case p: ProjectExec => p }
    val inSets = projs.flatMap(_.projectList.flatMap(_.collect {
      case i: InSet => i
    }))
    assert(inSets.nonEmpty, "no InSet probes in the domain projection")
    assert(inSets.exists(_.hset.size > 1000),
      "full-size rule set not probed via InSet")
    // compile every whole-stage stage and bound the emitted method
    // size: the default spark.sql.codegen.hugeMethodLimit (65535)
    // silently drops a too-big stage to interpreted execution — this
    // guard turns that silent fallback into a test failure
    val stages = plan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.nonEmpty, "domain projection left whole-stage codegen")
    for (s <- stages) {
      val (_, code) = s.doCodeGen()
      val (_, stats) = CodeGenerator.compile(code)
      assert(stats.maxMethodCodeSize > 0,
        "bytecode stats unavailable — cannot prove the method limit")
      assert(stats.maxMethodCodeSize < 65535,
        s"generated method ${stats.maxMethodCodeSize} bytes exceeds " +
          "the Janino/hugeMethodLimit bound")
    }
    // and the chain still answers correctly through this exact plan
    assert(q.collect().map(_.getString(0)).toSeq === Seq("example0.co.uk"))
  }

  test("oracle chain structure: the generated DuckDB CASE for a tiny " +
    "hand-written rule set equals a hand-AUTHORED chain") {
    // Both the Spark when-chain and the DuckDB oracle CASE are
    // generated from the same rule sets, so the cross-engine hash
    // gate alone cannot catch a systematic generation bug reproduced
    // on both sides. Anchor 1: the hand-computed host->domain
    // expectations in the depth tests above pin the Scala chain.
    // Anchor 2 (this test): the SQL generator's output for a small
    // rule set must equal a chain hand-written from the PSL
    // algorithm — a transliterated mistake (e.g. pairing wildAt(s)
    // instead of wildAt(s-1), or exceptions after suffix branches)
    // changes the emitted structure and fails here.
    val rules = Domains.PslRules(
      exact = Map(2 -> Seq("co.uk"), 3 -> Seq("act.edu.au")),
      wild = Map(1 -> Seq("ck"), 2 -> Seq("kawasaki.jp"),
        3 -> Seq("compute.amazonaws.com")),
      exc = Map(2 -> Seq("www.ck"), 3 -> Seq("city.kawasaki.jp")))
    def norm(s: String): String = s.replaceAll("\\s+", " ").trim
    val expected = """
      CASE WHEN host = '' THEN NULL
      WHEN regexp_matches(host, '^[0-9]+(\.[0-9]+)*$') THEN host
      WHEN len(ls) <= 2 THEN host
      WHEN len(ls) >= 3 AND ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        IN ('city.kawasaki.jp')
        THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
      WHEN len(ls) >= 2 AND ls[-2] || '.' || ls[-1] IN ('www.ck')
        THEN ls[-2] || '.' || ls[-1]
      WHEN len(ls) >= 4 AND (ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        IN ('compute.amazonaws.com'))
        THEN CASE WHEN len(ls) >= 5
          THEN ls[-5] || '.' || ls[-4] || '.' || ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          ELSE host END
      WHEN len(ls) >= 3 AND (ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        IN ('act.edu.au') OR ls[-2] || '.' || ls[-1] IN ('kawasaki.jp'))
        THEN CASE WHEN len(ls) >= 4
          THEN ls[-4] || '.' || ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          ELSE host END
      WHEN len(ls) >= 2 AND (ls[-2] || '.' || ls[-1] IN ('co.uk')
        OR ls[-1] IN ('ck'))
        THEN CASE WHEN len(ls) >= 3
          THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          ELSE host END
      ELSE ls[-2] || '.' || ls[-1]
      END"""
    assert(norm(SparkEntry.domainCaseSql(rules)) === norm(expected))
    // degraded rule sets (resource missing → the exact2-only
    // fallback) must still emit valid SQL: a branch with an empty
    // "IN ()" list is a DuckDB parse error that would fail every URL
    // oracle outright
    val fb = Domains.PslRules(Map(2 -> Seq("co.uk")), Map.empty, Map.empty)
    val fbSql = SparkEntry.domainCaseSql(fb)
    assert(!fbSql.contains("IN ()"))
    assert(norm(fbSql) === norm("""
      CASE WHEN host = '' THEN NULL
      WHEN regexp_matches(host, '^[0-9]+(\.[0-9]+)*$') THEN host
      WHEN len(ls) <= 2 THEN host
      WHEN len(ls) >= 2 AND (ls[-2] || '.' || ls[-1] IN ('co.uk'))
        THEN CASE WHEN len(ls) >= 3
          THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          ELSE host END
      ELSE ls[-2] || '.' || ls[-1]
      END"""))
  }

  test("dropDomains: blocklisted and unparseable rows both fail closed") {
    val docs = Seq(
      (1L, "https://spam.example.com/x"),
      (2L, "https://ok.other.org/y"),
      (3L, "garbage"),
      (4L, "http://www.example.co.uk/z")) // blocked via multi-suffix
      .toDF("doc_id", "url")
    val kept = Domains.dropDomains(docs, "url",
      Seq("example.com", "example.co.uk"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L))
  }

  test("dropUrlDuplicates: canonical collisions keep min id, " +
    "unparseable rows pass through") {
    val docs = Seq(
      (5L, "https://www.a.com/p?utm_source=x"),
      (2L, "HTTPS://WWW.A.COM:443/p"), // same canonical as 5
      (3L, "https://www.a.com/p2"),
      (9L, "not a url"),
      (8L, "nope")) // unparseable: both kept
      .toDF("doc_id", "url")
    val kept = Domains.dropUrlDuplicates(docs, "doc_id", "url")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L, 8L, 9L))
  }

  test("domainStats: counts per registrable domain") {
    val docs = Seq(
      (1L, "https://a.x.com/1", "ppp"),
      (2L, "https://b.x.com/2?utm_source=t", "qq"),
      (3L, "https://b.x.com/2", "rrrr"), // same canonical as 2
      (4L, "https://y.co.uk/", "s"))
      .toDF("doc_id", "url", "text")
    val got = Domains.domainStats(docs, "url", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("x.com") === ((3L, 2L, 9L))) // 3+2+4 chars
    assert(got("y.co.uk") === ((1L, 1L, 1L)))
  }
}
