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

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2)
    val input = if (args.length > 1) {
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1))), "UTF-8")
    } else {
      """up{job="demo"} 1 1700000000000
        |http_requests_total{code="200"} 1027 1700000000000
        |temperature_celsius 23.7 1700000000000
        |""".stripMargin
    }
    print(render(fanOut(Exposition.parse(input), n)))
  }
}
