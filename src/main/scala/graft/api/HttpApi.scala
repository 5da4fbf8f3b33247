package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.TimeSeries
import graft.sources.Prompb
import graft.storage.Storage
import java.net.InetSocketAddress
import org.apache.spark.sql.SparkSession
import org.xerial.snappy.Snappy

/** The Prometheus remote read/write wire protocol over HTTP — the S1/S2
  * entry points (reference: handlers/prom.go:232-310, routes
  * cmd/promhouse/main.go:76-77): snappy-compressed protobuf bodies,
  * `POST /write` = WriteRequest, `POST /read` = ReadRequest → ReadResponse.
  *
  * The handler is edge plumbing only: decode → DataFrame pipeline →
  * encode. Uses the JDK's built-in HTTP server — the wire layer is not the
  * scaling dimension (queries are); a production deployment would front
  * this with any HTTP stack and call the same Storage API.
  *
  * @param serveDerivedHintsOnWire opt-in: also serve rate/increase/delta
  *   hints as derived per-bucket samples. OFF by default — a stock
  *   Prometheus client treats hints as advisory and re-applies the func
  *   over returned samples (rate over rate values = rate-of-rate), so
  *   those hints are stripped at this edge (raw samples, exactly what the
  *   reference returns, prom.go:184-186). Enable only for pushdown-aware
  *   callers that consume the derived buckets directly.
  */
final class HttpApi(spark: SparkSession, store: Storage, port: Int = 0,
    serveDerivedHintsOnWire: Boolean = false) {

  // A7 running counter; atomic — concurrent /write handlers increment it
  // (the reference uses a prometheus Counter, which is atomic too)
  private val samplesWritten = new java.util.concurrent.atomic.AtomicLong(0L)
  private val readRequests = new java.util.concurrent.atomic.AtomicLong(0L)
  private val writeRequests = new java.util.concurrent.atomic.AtomicLong(0L)
  def totalSamplesWritten: Long = samplesWritten.get()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // without an executor the JDK server runs every handler on its single
  // dispatch thread — concurrent scrapes/queries would serialize (the
  // reference gets a goroutine per request from net/http)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  }))
  server.createContext("/write", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = respond(ex) {
      val body = Snappy.uncompress(ex.getRequestBody.readAllBytes())
      val series = Prompb.decodeWriteRequest(body)
      writeRequests.incrementAndGet()
      write(series)
      samplesWritten.addAndGet(series.map(_.samples.size).sum.toLong)
      Array.emptyByteArray
    }
  })
  server.createContext("/read", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = respond(ex) {
      val body = Snappy.uncompress(ex.getRequestBody.readAllBytes())
      val decoded = Prompb.decodeReadRequest(body)
      val queries =
        if (serveDerivedHintsOnWire) decoded else decoded.map(Storage.sanitizeWireHints)
      readRequests.incrementAndGet()
      val results = store.readAll(queries)
      Snappy.compress(Prompb.encodeReadResponse(results))
    }
  })
  // GET /metrics — text exposition of the server's own counters (the
  // reference's Storage implements prometheus.Collector and promhouse
  // serves /metrics; same scrape surface, hand-rendered)
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val out = (
        "# TYPE graft_samples_written_total counter\n" +
        s"graft_samples_written_total ${samplesWritten.get()}\n" +
        "# TYPE graft_read_requests_total counter\n" +
        s"graft_read_requests_total ${readRequests.get()}\n" +
        "# TYPE graft_write_requests_total counter\n" +
        s"graft_write_requests_total ${writeRequests.get()}\n").getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    }
  })

  def write(series: Seq[TimeSeries]): Unit = {
    import spark.implicits._
    val rows = series.flatMap(ts => ts.samples.map(s =>
      (ts.labels.map(l => l.name -> l.value).toMap, s.timestampMs, s.value)))
    store.write(rows.toDF("labels", "timestamp_ms", "value"))
  }

  private def respond(ex: HttpExchange)(f: => Array[Byte]): Unit =
    try {
      val out = f
      ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
      ex.getResponseHeaders.set("Content-Encoding", "snappy")
      ex.sendResponseHeaders(200, if (out.isEmpty) -1 else out.length)
      if (out.nonEmpty) ex.getResponseBody.write(out)
      ex.close()
    } catch {
      case e: Exception =>
        val msg = String.valueOf(e.getMessage).getBytes("UTF-8")
        ex.sendResponseHeaders(400, msg.length)
        ex.getResponseBody.write(msg)
        ex.close()
    }

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}

object HttpApi {

  /** The `promhouse` server binary equivalent (cmd/promhouse/main.go):
    * starts the remote read/write endpoints over a Parquet store.
    * `runMain graft.api.HttpApi <storeRoot> [port]` — point a Prometheus
    * `remote_write`/`remote_read` config at it. */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(sys.error("usage: HttpApi <storeRoot> [port]"))
    val port = args.lift(1).map(_.toInt).getOrElse(9116)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.Engine.install(spark)
    val api = new HttpApi(spark, new graft.storage.ParquetStore(spark, root), port)
    val bound = api.start()
    println(s"[graft] remote read/write listening on 127.0.0.1:$bound (store: $root)")
    Thread.currentThread().join() // serve until killed
  }

  /** Remote-write client (S10 write side): WriteRequest → snappy → POST. */
  def remoteWrite(url: String, series: Seq[TimeSeries]): Int = {
    val body = Snappy.compress(Prompb.encodeWriteRequest(series))
    post(s"$url/write", body)._1
  }

  /** Remote-read client (S10 read side). */
  def remoteRead(url: String, queries: Seq[graft.model.Query]): Seq[Seq[TimeSeries]] = {
    val body = Snappy.compress(Prompb.encodeReadRequest(queries))
    val (code, resp) = post(s"$url/read", body)
    require(code == 200, s"remote read failed: HTTP $code ${new String(resp, "UTF-8")}")
    Prompb.decodeReadResponse(Snappy.uncompress(resp))
  }

  private def post(url: String, body: Array[Byte]): (Int, Array[Byte]) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    conn.setRequestProperty("Content-Encoding", "snappy")
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    val in = if (code == 200) conn.getInputStream else conn.getErrorStream
    val out = if (in == null) Array.emptyByteArray else in.readAllBytes()
    conn.disconnect()
    (code, out)
  }
}
