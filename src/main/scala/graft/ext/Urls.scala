package graft.ext

/** Scala-side URL kernels for the crawl frontier — the same rule set the
  * url1 gate applies as codegen column expressions (strip fragment,
  * lowercase scheme+host, drop the default `:443` port, drop `utm_*`
  * tracking params and any dangling `?`/`&`), plus minimal reference
  * resolution (absolute http(s) pass through; root-relative resolve
  * against the page's scheme+host; everything else — protocol-relative,
  * path-relative, javascript:, mailto: — is not frontier material).
  * Pure per-row functions: map-only at crawl scale. */
object Urls {

  /** url1's normalization rules over one URL string. Total: anything
    * unparseable passes through with only the always-safe rules applied. */
  def normalize(u: String): String = {
    val hash = u.indexOf('#')
    val nofrag = if (hash < 0) u else u.substring(0, hash)
    val schemeEnd = nofrag.indexOf("://")
    if (schemeEnd < 0) return nofrag
    val pathStart = nofrag.indexOf('/', schemeEnd + 3)
    val headEnd = if (pathStart < 0) nofrag.length else pathStart
    var head = nofrag.substring(0, headEnd).toLowerCase
    if (head.endsWith(":443")) head = head.substring(0, head.length - 4)
    var tail = nofrag.substring(headEnd)
    tail = tail.replaceAll("utm_[a-z_]+=[^&#]*&?", "")
    tail = tail.replaceAll("[?&]$", "")
    head + tail
  }

  /** Resolve an href against its page URL to an absolute http(s) URL, or
    * None when it isn't frontier material. */
  def resolve(pageUrl: String, href: String): Option[String] = {
    if (href.startsWith("http://") || href.startsWith("https://")) Some(href)
    else if (href.startsWith("//")) None // protocol-relative: ambiguous, skip
    else if (href.startsWith("/")) {
      val schemeEnd = pageUrl.indexOf("://")
      if (schemeEnd < 0) None
      else {
        val pathStart = pageUrl.indexOf('/', schemeEnd + 3)
        val head = if (pathStart < 0) pageUrl else pageUrl.substring(0, pathStart)
        Some(head + href)
      }
    } else None
  }

  /** [[resolve]] then [[normalize]] — the frontier's per-link pipeline. */
  def frontierUrl(pageUrl: String, href: String): Option[String] =
    resolve(pageUrl, href).map(normalize)

  /** The host (authority, lowercased, port kept except the :443 a
    * normalized URL never carries) of an absolute URL — the politeness
    * key. Unparseable → the whole string (one bucket per oddball). */
  def host(u: String): String = {
    val schemeEnd = u.indexOf("://")
    if (schemeEnd < 0) return u
    val pathStart = u.indexOf('/', schemeEnd + 3)
    val end = if (pathStart < 0) u.length else pathStart
    u.substring(schemeEnd + 3, end).toLowerCase
  }
}
