package graft.ext

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Boilerplate-stripped HTML→text extraction — the honest front door of a
  * raw-crawl pipeline: real Common Crawl arrives as WARC `response`
  * records holding HTML, and the RefinedWeb/C4 ladder starts with
  * `url filter → html→text → quality gates`, not with pre-extracted WET
  * text. This implements the published jusText/trafilatura RULE FAMILY
  * (Pomikálek 2011; Barbaresi 2021) — no code is derived from either:
  *
  *   1. drop non-content subtrees outright: `<head>`, `<script>`,
  *      `<style>`, comments, doctypes/processing instructions;
  *   2. segment the remaining text into BLOCKS at block-level element
  *      boundaries (`p div li h1..h6 nav footer table tr ...` — the HTML5
  *      flow-content set), the granularity both papers score at;
  *   3. per block, decode character entities and collapse whitespace;
  *   4. keep a block iff it is long enough (`minLen`) AND its LINK
  *      DENSITY (chars inside `<a>` / total chars) is at most
  *      `maxLinkDensity` — the two rules that kill navigation bars,
  *      share buttons, and footer link farms while keeping prose that
  *      merely contains a citation link.
  *
  * The kernel is a pure per-document function run via `mapPartitions`
  * (one pass, no allocation beyond the block buffers) — at 100 TB this is
  * map-only over crawl shards, shuffle-free, and feeds straight into the
  * t5/t8/t10 quality gates. Scanner and rules are original; contract
  * pinned by the `html1_extract` gate (deterministic synthetic pages
  * whose expected extraction a DuckDB oracle recomputes — the mm2
  * fixture discipline) and ExtSpec edge-case tests. */
object HtmlText {

  /** HTML5 flow-content elements that end a text block (open OR close tag). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2", "h3", "h4",
    "h5", "h6", "table", "thead", "tbody", "tr", "td", "th", "nav", "footer",
    "header", "aside", "article", "section", "main", "blockquote", "pre",
    "figure", "figcaption", "form", "fieldset", "hr", "br", "body", "html",
    "title")

  /** Raw-text elements: their content is NOT markup; skip to the close tag. */
  private val RawTextTags: Set[String] = Set("script", "style", "textarea", "noscript")

  /** One segmented block: collapsed text plus its link-char ratio. */
  final case class Block(text: String, linkRatio: Double)

  /** Decode the common named entities plus numeric `&#N;`/`&#xN;` forms.
    * An unknown or malformed entity passes through literally (browsers do
    * the same) — extraction must be total on arbitrary crawl bytes. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" | "#39" => "'"
            case "nbsp" => " "
            case "copy" => "©"
            case "mdash" => "—"
            case "ndash" => "–"
            case "hellip" => "…"
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              val cp = scala.util.Try {
                if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                  Integer.parseInt(ent.substring(2), 16)
                else Integer.parseInt(ent.substring(1))
              }.toOption
              cp.filter(Character.isValidCodePoint)
                .map(p => new String(Character.toChars(p))).orNull
            case _ => null
          }
          if (rep != null) {
            sb.append(rep); i = semi + 1; consumed = true
          }
        }
      }
      if (!consumed) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Collapse whitespace runs to single spaces and trim. */
  def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Case-insensitive `indexOf` for the raw-text close-tag scan (ASCII
    * tag names only — per the HTML spec). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Scan from `from` (just past the tag name) to the tag-close `'>'`,
    * tracking attribute-value state per the HTML5 tokenizer: `'>'` inside
    * a quoted value (inline JS handlers, data-attrs) is tag content, and
    * a `'/'` inside an UNQUOTED value (a bare URL ending in `/`) is value
    * content — not a self-closing marker. Returns (index of the real
    * `'>'` or -1, self-closing?). */
  private def tagClose(html: String, from: Int): (Int, Boolean) = {
    val n = html.length
    var k = from
    var quote: Char = '\u0000'
    var afterEq = false  // just saw '=': value starts at next non-ws char
    var unquoted = false // inside an unquoted attribute value
    while (k < n) {
      val ch = html.charAt(k)
      if (quote != '\u0000') {
        if (ch == quote) quote = '\u0000'
      } else if (afterEq) {
        if (ch == '"' || ch == '\'') { quote = ch; afterEq = false }
        else if (ch == '>') return (k, false) // empty value: `href=>`
        else if (!Character.isWhitespace(ch)) { unquoted = true; afterEq = false }
      } else if (unquoted) {
        if (ch == '>') return (k, false) // trailing '/' belongs to the value
        else if (Character.isWhitespace(ch)) unquoted = false
      } else {
        if (ch == '>') return (k, k > from && html.charAt(k - 1) == '/')
        else if (ch == '=') afterEq = true
      }
      k += 1
    }
    (-1, false)
  }

  /** Segment `html` into text blocks with link ratios — one linear pass,
    * no DOM. Malformed markup degrades gracefully (a stray `<` is text;
    * an unclosed raw-text element swallows to end-of-input, as browsers
    * treat it). */
  def blocks(html: String): Vector[Block] = {
    val n = html.length
    val out = Vector.newBuilder[Block]
    val text = new java.lang.StringBuilder(256)
    val link = new java.lang.StringBuilder(64)
    var i = 0
    var headDepth = 0
    var aDepth = 0

    def flush(): Unit = {
      val t = collapse(decodeEntities(text.toString))
      if (t.nonEmpty) {
        val l = collapse(decodeEntities(link.toString))
        out += Block(t, l.length.toDouble / t.length)
      }
      text.setLength(0); link.setLength(0)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          val close = html.charAt(i + 1) == '/'
          var j = i + (if (close) 2 else 1)
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) {
            // a stray '<' (e.g. "x < y" in malformed pages) is text
            if (headDepth == 0) { text.append(c); if (aDepth > 0) link.append(c) }
            i += 1
          } else {
            val (gt, selfClosing) = tagClose(html, j)
            val tagEnd = if (gt < 0) n else gt + 1
            if (BlockTags.contains(name)) flush()
            name match {
              case "head" => headDepth = math.max(0, headDepth + (if (close) -1 else 1))
              case "a" =>
                if (close) aDepth = math.max(0, aDepth - 1)
                else if (!selfClosing) aDepth += 1
              case _ => ()
            }
            if (!close && RawTextTags.contains(name)) {
              val e = indexOfIgnoreCase(html, s"</$name", tagEnd)
              i = if (e < 0) n
              else { val g = html.indexOf('>', e); if (g < 0) n else g + 1 }
            } else i = tagEnd
          }
        }
      } else {
        if (headDepth == 0) { text.append(c); if (aDepth > 0) link.append(c) }
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** The jusText-family keep rule over [[blocks]]. */
  def keptBlocks(html: String, minLen: Int = 25,
      maxLinkDensity: Double = 0.33): Vector[String] =
    blocks(html).collect {
      case Block(t, r) if t.length >= minLen && r <= maxLinkDensity => t
    }

  /** Extract the main text of one page: kept blocks joined by newlines. */
  def extract(html: String, minLen: Int = 25,
      maxLinkDensity: Double = 0.33): String =
    keptBlocks(html, minLen, maxLinkDensity).mkString("\n")

  // ---------------------------------------------------------------- Spark

  final case class PageRow(doc_id: Long, url: String, html: String)
  final case class ExtractedDoc(doc_id: Long, n_blocks: Int, text: String)

  /** Map-only distributed extraction — the shape a 100 TB crawl runs:
    * one pass per page inside the partition iterator, no shuffle. */
  def extractDocs(pages: Dataset[PageRow], minLen: Int = 25,
      maxLinkDensity: Double = 0.33): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.map { p =>
      val kept = keptBlocks(p.html, minLen, maxLinkDensity)
      ExtractedDoc(p.doc_id, kept.size, kept.mkString("\n"))
    })
  }

  /** (doc_id, url, html) frame → extracted docs, for composing after
    * [[graft.sources.Warc.readResponses]]. */
  def extractFrame(pages: org.apache.spark.sql.DataFrame): Dataset[ExtractedDoc] = {
    import pages.sparkSession.implicits._
    extractDocs(pages.select(col("doc_id"), col("url"), col("html")).as[PageRow])
  }

  final case class ExtractedPage(doc_id: Long, url: String, n_blocks: Int, text: String)

  /** [[extractFrame]] keeping the crawl URL in the output row — so a
    * consumer that needs provenance ([[graft.tools.Curate.fromCrawl]]'s
    * source label) gets it from the SAME single pass over the crawl
    * shards, instead of a join whose probe side re-runs the WARC
    * gunzip + record parse. Still map-only: no shuffle. */
  def extractFrameWithUrl(pages: org.apache.spark.sql.DataFrame): Dataset[ExtractedPage] = {
    import pages.sparkSession.implicits._
    pages.select(col("doc_id"), col("url"), col("html")).as[PageRow]
      .mapPartitions(_.map { p =>
        val kept = keptBlocks(p.html)
        ExtractedPage(p.doc_id, p.url, kept.size, kept.mkString("\n"))
      })
  }

  final case class ExtractedLinkedPage(doc_id: Long, url: String, n_blocks: Int,
      text: String, link_hosts: Seq[String])

  /** [[extractFrameWithUrl]] plus each page's distinct absolute-outlink
    * hosts, from the SAME single pass (the anchor walk shares the scan;
    * the crawl shards are still gunzipped + parsed exactly once) — the
    * link-graph feed [[graft.tools.Curate.fromCrawl]]'s centrality stage
    * consumes. Map-only: no shuffle. */
  def extractFrameWithLinks(pages: org.apache.spark.sql.DataFrame): Dataset[ExtractedLinkedPage] = {
    import pages.sparkSession.implicits._
    pages.select(col("doc_id"), col("url"), col("html")).as[PageRow]
      .mapPartitions(_.map { p =>
        val kept = keptBlocks(p.html)
        val hosts = anchors(p.html).iterator
          .flatMap(a => graft.ext.Urls.resolve(p.url, a.href))
          .flatMap(u => hostOf(u))
          .toVector.distinct
        ExtractedLinkedPage(p.doc_id, p.url, kept.size, kept.mkString("\n"), hosts)
      })
  }

  /** Lowercased host of an absolute URL (port/path off), None if unparseable. */
  def hostOf(url: String): Option[String] = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) None
    else {
      var end = schemeEnd + 3
      while (end < url.length && url.charAt(end) != '/' && url.charAt(end) != ':') end += 1
      val h = url.substring(schemeEnd + 3, end).toLowerCase
      if (h.isEmpty) None else Some(h)
    }
  }

  // ------------------------------------------------------ synthetic fixture

  /** One deterministic synthetic page per doc_id — the encode half of the
    * html1 round trip (the mm2 fixture discipline). The page carries every
    * boilerplate class the rule family must strip — head/title, style,
    * script (with markup-looking strings inside), comments, an all-links
    * nav, an all-links share bar, a too-short footer — around
    * `1 + doc_id % 4` content paragraphs whose text (including an inline
    * citation link in paragraph 0 and an `&amp;` entity) the DuckDB
    * oracle recomputes from the same parameters. */
  def syntheticHtml(docId: Long): String = {
    val nParas = 1 + (docId % 4).toInt
    val paras = (0 until nParas).map { i =>
      val reps = 1 + ((docId + i) % 3).toInt
      val citation = if (i == 0) "<a href=\"/ref\">reference link</a> " else ""
      s"<p>Section $i of document $docId: $citation" +
        "lorem ipsum dolor sit amet " * reps +
        "consectetur &amp; adipiscing.</p>"
    }
    s"""<!DOCTYPE html>
       |<html><head><title>Doc $docId</title>
       |<style>body { color: #000; } /* <p>not text</p> */</style>
       |<script>var x = $docId; console.log("<p>not text</p>");</script>
       |</head>
       |<body>
       |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
       |<!-- boilerplate comment <p>ghost</p> -->
       |<div class="content">
       |${paras.mkString("\n")}
       |</div>
       |<div class="share"><a href="/tw">Tweet</a> <a href="/fb">Share</a></div>
       |<footer>&copy; 2026 Example Corp</footer>
       |</body></html>""".stripMargin
  }

  /** One synthetic page per document (map-only, like the mm* fixtures),
    * with the [[graft.sources.Warc.withUrls]] provenance URL shape. */
  def asGeneratedPages(spark: SparkSession, dir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        PageRow(id, s"https://crawl.example/$id", syntheticHtml(id))))
  }

  // ------------------------------------------------------------- outlinks

  /** First `href` attribute value in `html[from, until)` (the attribute
    * region of one tag), decoded; null if absent. Follows the HTML5
    * attribute grammar: names run to ws/`=`/`/`/end; a `=` introduces a
    * quoted or unquoted value (unquoted ends at ws). `until` comes from
    * [[tagClose]], so quoted `>` is already inside the region. */
  private def hrefValue(html: String, from: Int, until: Int): String = {
    var k = from
    while (k < until) {
      while (k < until && (Character.isWhitespace(html.charAt(k)) || html.charAt(k) == '/')) k += 1
      val nameStart = k
      while (k < until && !Character.isWhitespace(html.charAt(k)) &&
        html.charAt(k) != '=' && html.charAt(k) != '/') k += 1
      val name = html.substring(nameStart, k)
      while (k < until && Character.isWhitespace(html.charAt(k))) k += 1
      var value = ""
      if (k < until && html.charAt(k) == '=') {
        k += 1
        while (k < until && Character.isWhitespace(html.charAt(k))) k += 1
        if (k < until && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
          val q = html.charAt(k)
          val e = html.indexOf(q, k + 1)
          val end = if (e < 0 || e > until) until else e
          value = html.substring(k + 1, end)
          k = end + 1
        } else {
          val valStart = k
          while (k < until && !Character.isWhitespace(html.charAt(k))) k += 1
          value = html.substring(valStart, k)
        }
      }
      if (name.equalsIgnoreCase("href")) return decodeEntities(value)
      if (k == nameStart) k += 1 // safety: never stall on unexpected chars
    }
    null
  }

  /** One extracted anchor: href target plus collapsed anchor text. */
  final case class Anchor(href: String, text: String)

  /** All `<a href=…>` anchors of one page (target + anchor text), in
    * document order — the crawl frontier / link-graph / anchor-text feed.
    * Same single-pass scanner discipline as [[blocks]]: comments,
    * doctypes and raw-text elements (a script string containing
    * `<a href=…>` is NOT a link) are skipped, quote-aware tag ends, total
    * on malformed input. Anchor text accumulates until the close tag
    * (nested markup contributes its text, not its tags); a new anchor or
    * end-of-input flushes a dangling open anchor with the text seen so
    * far. Map-only at crawl scale. */
  def anchors(html: String): Vector[Anchor] = {
    val n = html.length
    val out = Vector.newBuilder[Anchor]
    var curHref: String = null
    val txt = new java.lang.StringBuilder(64)

    def flush(): Unit = {
      if (curHref != null) {
        out += Anchor(curHref, collapse(decodeEntities(txt.toString)))
        curHref = null
      }
      txt.setLength(0)
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          val close = html.charAt(i + 1) == '/'
          var j = i + (if (close) 2 else 1)
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) {
            if (curHref != null) txt.append(c)
            i += 1
          } else {
            val (gt, _) = tagClose(html, j)
            val tagEnd = if (gt < 0) n else gt + 1
            if (name == "a") {
              flush() // close tag, or a new anchor while one is open
              if (!close) {
                val href = hrefValue(html, j, if (gt < 0) n else gt)
                if (href != null && href.nonEmpty) curHref = href
              }
            }
            if (!close && RawTextTags.contains(name)) {
              val e = indexOfIgnoreCase(html, s"</$name", tagEnd)
              i = if (e < 0) n
              else { val g = html.indexOf('>', e); if (g < 0) n else g + 1 }
            } else i = tagEnd
          }
        }
      } else {
        if (curHref != null) txt.append(c)
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** Just the `<a href=…>` targets, in document order. */
  def outlinks(html: String): Vector[String] = anchors(html).map(_.href)

  final case class PageLinks(doc_id: Long, links: Seq[String])

  /** Map-only distributed outlink extraction over (doc_id, html) pages. */
  def outlinkDocs(pages: Dataset[PageRow]): Dataset[PageLinks] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.map(p => PageLinks(p.doc_id, outlinks(p.html))))
  }

  final case class PageAnchor(doc_id: Long, href: String, text: String)

  /** Map-only distributed anchor extraction (target + anchor text). */
  def anchorDocs(pages: Dataset[PageRow]): Dataset[PageAnchor] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.flatMap(p =>
      anchors(p.html).map(a => PageAnchor(p.doc_id, a.href, a.text))))
  }

  /** Cross-host link fixture: [[syntheticHtml]] plus a "related sites"
    * block of [[LinkFanout]] absolute links to deterministic other hosts
    * — `dst_j = (doc_id · P_j + j) mod [[LinkHosts]]` for fixed odd
    * multipliers P, the page's own host being `doc_id mod [[LinkHosts]]`.
    * The DuckDB oracle recomputes the edge set from these parameters
    * while the Spark side walks the real HTML through the real scanner —
    * two independent derivations of the same graph. */
  val LinkHosts = 40
  val LinkMultipliers: Seq[Long] = Seq(7L, 13L, 29L)
  def LinkFanout: Int = LinkMultipliers.size

  def syntheticLinkedHtml(docId: Long): String = {
    val related = LinkMultipliers.zipWithIndex.map { case (p, j) =>
      val dst = java.lang.Math.floorMod(docId * p + j + 1, LinkHosts.toLong)
      s"""<a href="https://host$dst.example/page$docId">site $dst</a>"""
    }
    syntheticHtml(docId).replace("<div class=\"share\">",
      s"""<div class="related">${related.mkString(" ")}</div>\n<div class="share">""")
  }

  /** One linked synthetic page per document; host = doc_id mod [[LinkHosts]]. */
  def asLinkedPages(spark: SparkSession, dir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        PageRow(id, s"https://host${id % LinkHosts}.example/page$id",
          syntheticLinkedHtml(id))))
  }
}
