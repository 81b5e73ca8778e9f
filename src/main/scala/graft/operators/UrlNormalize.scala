package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side dedup primitive: the same
  * page arrives under `HTTPS://Host:443/p?utm_source=x&b=1&a=2#frag`
  * and `https://host/p?a=2&b=1`, and fetch scheduling / URL-level
  * dedup / frontier joins all need ONE canonical key. The contract is
  * a fixed, oracle-restatable chain (RFC 3986 §6 normalizations plus
  * the standard tracking-param strip):
  *
  *   1. trim, drop the fragment (`#…` — never sent to the server);
  *   2. lowercase the scheme and authority (host is case-insensitive;
  *      the PATH is not — `example.com/API` stays `API`);
  *   3. strip default ports (`:80` for http, `:443` for https);
  *   4. drop tracking query params (`utm_*`, `fbclid`, `gclid`) and
  *      empty fragments between `&`s;
  *   5. sort surviving params byte-lexicographically (query order is
  *      almost never semantic; sorting makes the key stable);
  *   6. drop the `?` entirely when no params survive.
  *
  * Pure column expressions (regex + higher-order `filter` +
  * `array_sort`), whole-stage codegen, zero shuffles — at crawl scale
  * this runs inside the scan that reads the frontier. Canonicalization
  * is idempotent (spec-locked): applying it twice is the identity.
  */
object UrlNormalize {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)="

  def canonicalize(url: Column): Column = {
    val u1 = regexp_replace(trim(url), "#.*$", "")
    val head = regexp_extract(u1, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    val rest = u1.substr(length(head) + lit(1), length(u1))
    val headLower = lower(head)
    val headNoPort = regexp_replace(
      regexp_replace(headLower, "^(https://[^/?:]*):443$", "$1"),
      "^(http://[^/?:]*):80$", "$1")
    val qpos = locate("?", rest)
    val path = when(qpos > 0, rest.substr(lit(1), qpos - lit(1)))
      .otherwise(rest)
    val query = when(qpos > 0, rest.substr(qpos + lit(1), length(rest)))
      .otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val sortedQ = array_join(array_sort(params), "&")
    concat(headNoPort, path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Lowercased host (no port) — the crawl scheduler's politeness and
    * per-site aggregation key. Empty string for non-URL input.
    */
  def host(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?:#]+)", 1))

  /** Frontier layout for a polite fetcher: canonical-key dedup
    * survivors, hash-partitioned BY HOST and sorted within each
    * partition by (host, url) — every host's queue is contiguous and
    * ordered inside one partition, so per-host rate limiting is a
    * sequential walk with no cross-executor coordination. The dedup
    * aggregate and the layout shuffle share the same pass.
    */
  def frontierByHost(
      urls: org.apache.spark.sql.DataFrame, urlCol: String,
      idCol: String, numPartitions: Int): org.apache.spark.sql.DataFrame = {
    require(numPartitions > 0, s"numPartitions must be > 0")
    urls
      .groupBy(canonicalize(col(urlCol)).as("canonical"))
      .agg(min(col(idCol)).as("survivor"))
      .withColumn("host", host(col("canonical")))
      .repartition(numPartitions, col("host"))
      .sortWithinPartitions("host", "canonical")
  }
}
