package graft.tools

import graft.ext.ExtOps
import graft.model.{Label, TimeSeries}
import graft.sources.Exposition

/** fake_exporter-equivalent generator (reference: cmd/fake_exporter):
  * takes an exposition payload, fans each metric out across N instances
  * with a templated `instance` label (X10, faker.go:106-151) and
  * deterministic ±10% value jitter (X9, faker.go:50-74): NaN/Inf/0/1 pass
  * through, integral values stay integral. Jitter is seeded from
  * (series fingerprint, instance) via splitmix64 — reproducible without
  * RNG state. */
object FakeExporter {

  def jitter(value: Double, seed: Long): Double = {
    if (value.isNaN || value.isInfinite || value == 0d || value == 1d) return value
    val u = (ExtOps.splitmix64(seed) >>> 11).toDouble / (1L << 53).toDouble // [0,1)
    val jittered = value * (0.9 + 0.2 * u)
    if (value == math.rint(value)) math.rint(jittered) else jittered
  }

  def fanOut(series: Seq[TimeSeries], instances: Int,
      template: String = "instance-%d"): Seq[TimeSeries] =
    for {
      ts <- series
      i <- 0 until instances
    } yield {
      val base = graft.core.Fingerprint.of(ts.labels)
      TimeSeries(
        (ts.labels.filterNot(_.name == "instance") :+
          Label("instance", template.format(i))).sortBy(_.name),
        ts.samples.map(s => s.copy(value = jitter(s.value, base ^ (i.toLong * 0x9e37L) ^ s.timestampMs))))
    }

  /** Render series back to exposition text (sorted for stable output,
    * like the reference's faker_test golden). */
  def render(series: Seq[TimeSeries]): String = {
    val lines = for {
      ts <- series
      name = ts.labels.find(_.name == "__name__").map(_.value).getOrElse("unnamed")
      rest = ts.labels.filterNot(_.name == "__name__")
      labelStr = if (rest.isEmpty) ""
        else rest.map(l => s"""${l.name}="${escape(l.value)}"""").mkString("{", ",", "}")
      s <- ts.samples
      valueStr = if (s.value.isNaN) "NaN"
        else if (s.value.isPosInfinity) "+Inf"
        else if (s.value.isNegInfinity) "-Inf"
        else if (s.value == math.rint(s.value) && math.abs(s.value) < 1e15) s.value.toLong.toString
        else s.value.toString
    } yield s"$name$labelStr $valueStr ${s.timestampMs}"
    lines.sorted.mkString("", "\n", "\n")
  }

  private def escape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Serve the fan-out as a live scrape target (reference:
    * cmd/fake_exporter/main.go — an HTTP endpoint Prometheus scrapes, each
    * scrape re-perturbed). `base` is re-evaluated per request, so a
    * supplier that re-stamps timestamps yields fresh jitter per scrape
    * (jitter is seeded from (fingerprint, instance, timestamp)). Returns
    * the bound server; `stop(0)` it when done. Scrape at
    * `http://127.0.0.1:<port>/metrics`. */
  def serve(base: () => Seq[TimeSeries], instances: Int, port: Int = 0,
      template: String = "instance-%d"): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-fake-exporter"); t.setDaemon(true); t
    }))
    server.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
      val out = render(fanOut(base(), instances, template)).getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    // usage: FakeExporter [instances] [expositionFile] [--serve [port]]
    val serveIdx = args.indexOf("--serve")
    val positional = if (serveIdx >= 0) args.take(serveIdx) else args
    val n = positional.headOption.map(_.toInt).getOrElse(2)
    val input = if (positional.length > 1) {
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(positional(1))), "UTF-8")
    } else {
      """up{job="demo"} 1 1700000000000
        |http_requests_total{code="200"} 1027 1700000000000
        |temperature_celsius 23.7 1700000000000
        |""".stripMargin
    }
    val parsed = Exposition.parse(input)
    if (serveIdx >= 0) {
      val port = args.lift(serveIdx + 1).map(_.toInt).getOrElse(9115)
      // live mode: re-stamp each scrape at scrape time so repeated scrapes
      // see moving, freshly-jittered values (the reference proxies a live
      // exporter; a fixed payload plays that role here)
      val server = serve(() => {
        val now = System.currentTimeMillis()
        parsed.map(ts => ts.copy(samples = ts.samples.map(_.copy(timestampMs = now))))
      }, n, port)
      println(s"[fake_exporter] serving ${parsed.size} base series x $n instances " +
        s"on http://127.0.0.1:${server.getAddress.getPort}/metrics")
      Thread.currentThread().join()
    } else print(render(fanOut(parsed, n)))
  }
}
