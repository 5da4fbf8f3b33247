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
            val gt = html.indexOf('>', j)
            val tagEnd = if (gt < 0) n else gt + 1
            if (BlockTags.contains(name)) flush()
            name match {
              case "head" => headDepth = math.max(0, headDepth + (if (close) -1 else 1))
              case "a" =>
                val selfClosing = gt > 0 && gt > i && html.charAt(gt - 1) == '/'
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
}
