package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL / domain operators for web-corpus curation: host + registrable-domain
 * extraction and per-domain balancing (quota sampling). A web-scale crawl
 * is dominated by a few giant domains; training-data pipelines cap each
 * domain's contribution so the corpus is not 40% one boilerplate farm.
 *
 * Scale contracts:
 *  - host/domain extraction is a pure projection (shared RE2-compatible
 *    regex + array ops, mirrored verbatim in the DuckDB oracles);
 *  - [[domainQuotaSample]] is the scale path: one map-side-combinable
 *    domain-count aggregate, a domain-keyed join of the (small) rate table
 *    back, and a deterministic md5-unit filter — no window over the
 *    (possibly enormous, always skewed) domain partitions, stable under
 *    retries/repartitioning, expected kept ≈ quota per domain;
 *  - [[domainTopN]] is the exact-N variant via a per-domain window: correct
 *    for moderate domains, but ONE task owns a domain — at crawl scale use
 *    the quota sampler (this is the same exact-vs-scale split as
 *    [[Similarity.cosineNearDups]] vs [[Similarity.cosineStarEdges]]).
 */
object UrlOps {

  /** Host capture: scheme://HOST — stops at /, ?, #, : (port). RE2-safe. */
  val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"

  /** Lower-cased host of a URL column ('' when the URL does not parse). */
  def host(url: Column): Column = lower(regexp_extract(url, hostRe, 1))

  /** Public-suffix subset shipped as a resource
   * (`graft/urlops/public_suffix.tsv`, curated from the public PSL;
   * replace with a full dump in production — rule unchanged). Split by
   * suffix label count: the registrable domain is ONE label more than the
   * longest matching suffix. The sets ride the plan as `InSet` literals
   * (a few hundred strings — cheaper than a broadcast join for a pure
   * projection, and mirrorable 1:1 in the DuckDB oracle). */
  lazy val (publicSuffixes2: Seq[String], publicSuffixes3: Seq[String]) = {
    val in = getClass.getResourceAsStream("/graft/urlops/public_suffix.tsv")
    require(in != null, "missing resource graft/urlops/public_suffix.tsv")
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try {
      val all = Iterator.continually(r.readLine()).takeWhile(_ != null)
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      val byLen = all.groupBy(_.count(_ == '.'))
      require(byLen.keySet.subsetOf(Set(1, 2)),
        s"unsupported suffix label depth: ${byLen.keySet}")
      (byLen.getOrElse(1, Vector.empty), byLen.getOrElse(2, Vector.empty))
    } finally r.close()
  }

  /**
   * Registrable domain from a host: longest-matching public suffix plus
   * one label (news.bbc.co.uk → bbc.co.uk, school.dist.k12.ca.us →
   * dist.k12.ca.us); plain TLDs keep two labels. Hosts with ≤2 labels
   * (or IPs/localhost) pass through unchanged.
   */
  def registrableDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", slice(parts, -2, 2))
    val last3 = concat_ws(".", slice(parts, -3, 3))
    when(n <= 2, hostCol)
      .when(n >= 4 && last3.isInCollection(publicSuffixes3),
        concat_ws(".", slice(parts, -4, 4)))
      .when(last2.isInCollection(publicSuffixes2), last3)
      .otherwise(last2)
  }

  /** Adds `host` and `domain` columns. Pure projection. */
  def withDomains(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val h = host(col(urlCol))
    docs.withColumn("host", h).withColumn("domain", registrableDomain(h))
  }

  /** Per-domain corpus census: page count and distinct-host count. */
  def domainStats(docs: DataFrame, urlCol: String = "url"): DataFrame =
    withDomains(docs, urlCol)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"), countDistinct(col("host")).as("n_hosts"))

  /** The deterministic [0,1) unit used by every sampler here: first 6 md5
   * hex digits of `seed:id` over 16^6 (the [[Decontam.hashSample]] unit). */
  private def hashUnit(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 6), 16, 10)
      .cast("double") / (1 << 24).toDouble

  /**
   * Deterministic per-domain quota sampling: every domain keeps each page
   * with probability `min(1, quota / n_pages(domain))`, decided by the
   * page's md5 unit — expected kept ≈ quota for big domains, everything
   * for small ones. Reproducible under retries and repartitioning (no
   * `rand()`), skew-free (no per-domain window/sort).
   */
  def domainQuotaSample(docs: DataFrame, quota: Int,
      urlCol: String = "url", idCol: String = "doc_id",
      seed: String = "dq"): DataFrame = {
    val d = withDomains(docs, urlCol)
    val rates = d.groupBy("domain").agg(count(lit(1)).as("n_pages"))
      .withColumn("keep_rate",
        least(lit(1.0), lit(quota.toDouble) / col("n_pages")))
    d.join(rates, Seq("domain"))
      .where(hashUnit(col(idCol), seed) < col("keep_rate"))
  }

  /**
   * Exact top-N pages per domain, ranked by deterministic md5 unit (a
   * reproducible uniform draw), ties on id. One window per domain — see
   * the object doc for when to prefer [[domainQuotaSample]].
   */
  def domainTopN(docs: DataFrame, n: Int, urlCol: String = "url",
      idCol: String = "doc_id", seed: String = "dq"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), col(idCol))
    withDomains(docs, urlCol)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= n)
  }

  /** URL path capture: everything after the authority up to `?`/`#`
   * ('' when the URL has no path). RE2-safe, shared with the mirrors. */
  val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Every label-suffix of a host, longest first: a.b.co.uk →
   * [a.b.co.uk, b.co.uk, co.uk, uk]. Bounded by label count (hosts have
   * a handful), so the explode below multiplies the corpus by ~4, not by
   * the blocklist. `Cols.bound`: the split is a computed array — unbound,
   * each lambda element would re-split the host. */
  def hostSuffixes(hostCol: Column): Column =
    Cols.bound(split(hostCol, "\\.")) { p =>
      transform(sequence(lit(0), size(p) - 1),
        i => array_join(slice(p, i + 1, size(p) - i), "."))
    }

  /**
   * URL blocklist gate (the UT1-category role: every web-corpus pipeline
   * drops adult/ads/malware domains and URL keywords before anything
   * else). Two pattern kinds, each scale-shaped differently:
   *
   *  - `domainBlocks(pattern, category)` — matches a host exactly OR any
   *    parent domain (suffix-of-labels). The host explodes into its
   *    (bounded) suffix chain and EQUI-joins the broadcast blocklist —
   *    real blocklists are millions of domains, so this must never be a
   *    nested-loop; past broadcast size the same equi-join shuffles and
   *    still works.
   *  - `keywordBlocks(keyword, category)` — lower-cased substring match
   *    on the URL path. Inherently a nested-loop against the corpus:
   *    keep this list SMALL (UT1 keyword lists are dozens of entries).
   *
   * Output: the input plus `host`, `blocked`, and `block_hit` — the
   * lexicographically smallest `category|pattern` witness (deterministic
   * when several patterns hit), null for clean rows.
   */
  def blockVerdict(docs: DataFrame, domainBlocks: DataFrame,
      keywordBlocks: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    val based = docs.withColumn("_host", host(col(urlCol)))
      .withColumn("_path", lower(regexp_extract(col(urlCol), pathRe, 1)))
    val domHits = based
      .select(col(idCol), explode(hostSuffixes(col("_host"))).as("pattern"))
      .join(broadcast(domainBlocks.select("pattern", "category")), Seq("pattern"))
      .select(col(idCol),
        concat(col("category"), lit("|"), col("pattern")).as("_hit"))
    val kwHits = based.select(col(idCol), col("_path"))
      .join(broadcast(keywordBlocks.select("keyword", "category")),
        col("_path").contains(col("keyword")))
      .select(col(idCol),
        concat(col("category"), lit("|"), col("keyword")).as("_hit"))
    val verdicts = domHits.unionByName(kwHits)
      .groupBy(idCol).agg(min(col("_hit")).as("block_hit"))
    based.join(verdicts, Seq(idCol), "left")
      .withColumn("blocked", col("block_hit").isNotNull)
      .drop("_path")
      .withColumnRenamed("_host", "host")
  }
}
