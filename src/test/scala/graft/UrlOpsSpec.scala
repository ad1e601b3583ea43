package graft

import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** URL/domain ops: host parsing edges, registrable-domain heuristic,
 * quota-sampling determinism and bounds. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("host extraction handles ports, paths, queries, and junk") {
    val urls = Seq(
      "https://www.Example.COM/page?q=1",
      "http://news.bbc.co.uk:8080/story#frag",
      "ftp://files.site.org/a/b",
      "https://host",
      "not a url",
      "").toDF("url")
    val hosts = urls.select(UrlOps.host(col("url"))).as[String].collect()
    assert(hosts === Array("www.example.com", "news.bbc.co.uk",
      "files.site.org", "host", "", ""))
  }

  test("registrable domain: 2-label pass-through, PSL longest-suffix match") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.c.example.com" -> "example.com",
      "news.bbc.co.uk" -> "bbc.co.uk",
      "bbc.co.uk" -> "bbc.co.uk",
      "co.uk" -> "co.uk", // 2 labels pass through
      "example.org" -> "example.org",
      "localhost" -> "localhost",
      "cdn.epsilon.io" -> "epsilon.io",
      // multi-level public suffixes the pre-PSL heuristic missed
      "shop.zeta.com.au" -> "zeta.com.au",
      "blog.eta.co.jp" -> "eta.co.jp",
      "portal.theta.gouv.fr" -> "theta.gouv.fr",
      "media.iota.me.uk" -> "iota.me.uk",
      "www.kappa.or.jp" -> "kappa.or.jp",
      // three-level suffix: k12.ca.us keeps FOUR labels
      "school.dist.k12.ca.us" -> "dist.k12.ca.us",
      "dist.k12.ca.us" -> "dist.k12.ca.us",
      "k12.ca.us" -> "k12.ca.us", // the suffix itself passes through
      // ca.us is itself a suffix -> three labels
      "www.city.ca.us" -> "city.ca.us",
      // amazon.co is a plain .co (Colombia) domain, NOT a suffix hit
      "shop.amazon.co" -> "amazon.co")
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), UrlOps.registrableDomain(col("host")))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(got(h) === want, s"host=$h") }
    // resource loads: two-level and three-level suffix sets both non-empty
    assert(UrlOps.publicSuffixes2.size > 100)
    assert(UrlOps.publicSuffixes3.nonEmpty)
    assert(UrlOps.publicSuffixes2.contains("com.au"))
    assert(UrlOps.publicSuffixes3.contains("k12.ca.us"))
  }

  test("quota sample keeps everything under quota, ~quota over it; deterministic") {
    // one giant domain (400 pages), one small (25)
    val docs = (0L until 425L).map { i =>
      val hostn = if (i < 400) "big.example.com" else "tiny.example.org"
      (i, s"https://$hostn/p/$i")
    }.toDF("doc_id", "url")
    val kept = UrlOps.domainQuotaSample(docs, quota = 50)
    val byDom = kept.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom("example.org") === 25L) // under quota: rate 1.0, all kept
    val big = byDom("example.com")
    assert(big > 25L && big < 90L, s"got $big") // expected ~50, binomial spread
    // determinism under repartitioning
    val again = UrlOps.domainQuotaSample(docs.repartition(7), quota = 50)
      .select("doc_id").as[Long].collect().sorted
    assert(again === kept.select("doc_id").as[Long].collect().sorted)
  }

  test("domainTopN returns exactly n per domain with a total order") {
    val docs = (0L until 100L).map(i => (i, s"https://www.site${i % 2}.net/p/$i"))
      .toDF("doc_id", "url")
    val top = UrlOps.domainTopN(docs, n = 10)
    assert(top.count() === 20L)
    assert(top.groupBy("domain").count().as[(String, Long)].collect()
      .forall(_._2 === 10L))
    // ranks are 1..10 with no gaps
    val ranks = top
      .groupBy("domain").agg(sort_array(collect_list("rnk")).as("rs"))
      .select("rs").as[Seq[Int]].collect()
    assert(ranks.length === 2 && ranks.forall(_ === (1 to 10)))
  }

  test("blockVerdict: domain suffix + exact host + path keyword, deterministic witness") {
    val docs = Seq(
      (0L, "https://a.b.delta.net/x"),          // suffix hit: delta.net
      (1L, "https://m.alpha.com/ok"),           // exact-host hit
      (2L, "https://alpha.com/m.alpha.com"),    // blocked domain in PATH only → clean
      (3L, "https://safe.org/casino-night"),    // keyword hit
      (4L, "https://delta.net/casino"),         // both: min(ads|…, spam|…) = ads
      (5L, "not a url"),                        // unparseable → clean
      (6L, "https://notdelta.net/x"))           // notdelta.net ≠ *.delta.net → clean… suffix 'net' not listed
      .toDF("doc_id", "url")
    val dom = Seq(("delta.net", "ads"), ("m.alpha.com", "tracking"))
      .toDF("pattern", "category")
    val kw = Seq(("casino", "spam")).toDF("keyword", "category")
    val got = UrlOps.blockVerdict(docs, dom, kw)
      .select("doc_id", "blocked", "block_hit")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) "" else r.getString(2)))).toMap
    assert(got === Map(
      0L -> ((true, "ads|delta.net")),
      1L -> ((true, "tracking|m.alpha.com")),
      2L -> ((false, "")),
      3L -> ((true, "spam|casino")),
      4L -> ((true, "ads|delta.net")),
      5L -> ((false, "")),
      6L -> ((false, ""))))
    // row count preserved: the gate never drops or duplicates rows
    assert(UrlOps.blockVerdict(docs.repartition(5), dom, kw).count() === 7L)
  }
}
