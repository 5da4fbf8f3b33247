package graft

import graft.core.{Fingerprint, LabelsJson}
import graft.model.Label
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Ports the reference's fingerprint + JSON corpora
  * (utils/timeseries/fingerprint_test.go, storages/clickhouse/json_test.go). */
class CoreSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("fingerprint of empty label set is FNV offset basis") {
    // reference: fingerprint.go:63-66, fingerprint_test.go:27-30
    assert(Fingerprint.of(Seq.empty[Label]) === java.lang.Long.parseUnsignedLong("14695981039346656037"))
  }

  test("fingerprint golden: http_requests_total{code=200,handler=query}") {
    // reference: fingerprint_test.go:40-46 — golden 0x145426e4f81508d1
    val labels = Seq(
      Label("__name__", "http_requests_total"),
      Label("code", "200"),
      Label("handler", "query"))
    assert(Fingerprint.of(labels) === 0x145426e4f81508d1L)
    // unsorted input must produce the same value (sort-before-hash)
    assert(Fingerprint.of(labels.reverse) === 0x145426e4f81508d1L)
    assert(Fingerprint.of(labels.map(l => l.name -> l.value).toMap) === 0x145426e4f81508d1L)
  }

  test("fingerprint golden: README up{instance,job} — unsigned display") {
    // reference: README.md:35-41
    val labels = Map(
      "__name__" -> "up",
      "instance" -> "promhouse_clickhouse_exporter_1:9116",
      "job" -> "clickhouse")
    val fp = Fingerprint.of(labels)
    assert(Fingerprint.toUnsignedString(fp) === "7975981685167825999")
  }

  test("labels JSON canonical marshal") {
    assert(LabelsJson.marshal(Nil) === "{}")
    assert(LabelsJson.marshal(Seq(Label("__name__", "up"), Label("job", "ch")))
      === """{"__name__":"up","job":"ch"}""")
  }

  test("labels JSON escaping corpus (funny labels)") {
    // reference: json_test.go:31-61, storages_test.go:391-425
    val cases = Seq(
      "''" -> "''",
      "'`\"\\" -> "'`\\\"\\\\",
      "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t",
      "\\ \\\\ \\\\\\\\" -> "\\\\ \\\\\\\\ \\\\\\\\\\\\\\\\",
      "🆗" -> "🆗")
    for ((raw, escaped) <- cases) {
      val json = LabelsJson.marshal(Seq(Label("l", raw)))
      assert(json === s"""{"l":"$escaped"}""", s"for value $raw")
      assert(LabelsJson.unmarshal(json) === Map("l" -> raw), s"roundtrip of $raw")
    }
  }

  test("labels JSON roundtrip property (replaces go-fuzz corpus)") {
    // reference: storages/clickhouse/json_gofuzz.go:29-67
    val name = Gen.identifier.map(_.take(30))
    val value = Gen.asciiPrintableStr // plus targeted escapes below
    checkProp(Prop.forAll(Gen.mapOf(Gen.zip(name, value))) { m =>
      LabelsJson.unmarshal(LabelsJson.canonical(m)) == m
    })
    // targeted: control/escape-heavy values
    val funnyVal = Gen.listOf(Gen.oneOf("\\", "\"", "\n", "\r", "\t", "a", "🆗")).map(_.mkString)
    checkProp(Prop.forAll(Gen.mapOf(Gen.zip(name, funnyVal))) { m =>
      LabelsJson.unmarshal(LabelsJson.canonical(m)) == m
    })
  }

  test("ts/value pair codec: roundtrip and order preservation (PairOps)") {
    import graft.functions.PairOps
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue)
    val tsGen = Gen.oneOf(Gen.choose(PairOps.MinTs, PairOps.MaxTs),
      Gen.oneOf(PairOps.MinTs, PairOps.MaxTs, 0L, 1700000000000L))
    // NaN payloads must survive the codec RAW (rollup-served first/last
    // returns the same bytes raw serving does — e.g. the Prometheus
    // staleness marker); ordering among distinct payloads is
    // payload-dependent but deterministic, so they join the roundtrip
    // generator only, not the Double.compare order property below
    val payloadNaNs = Seq(
      java.lang.Double.longBitsToDouble(0x7ff0000000000002L), // staleness marker
      java.lang.Double.longBitsToDouble(0xfff8000000000123L)) // negative-sign payload
    val vGen = Gen.oneOf(Gen.chooseNum(-1e300, 1e300), Gen.oneOf(specials))
    val vGenRaw =
      Gen.oneOf(Gen.chooseNum(-1e300, 1e300), Gen.oneOf(specials ++ payloadNaNs))
    // RAW-bit-exact roundtrip, every NaN payload preserved
    checkProp(Prop.forAll(tsGen, vGenRaw) { (ts, v) =>
      val enc = PairOps.encode(ts, v)
      PairOps.decodeTs(enc) == ts &&
        java.lang.Double.doubleToRawLongBits(PairOps.decodeV(enc)) ==
          java.lang.Double.doubleToRawLongBits(v)
    })
    // decimal order ≡ (ts, value) lexicographic order, value per Double.compare
    // (holds whenever at most the canonical NaN bit pattern is present)
    checkProp(Prop.forAll(tsGen, vGen, tsGen, vGen) { (t1, v1, t2, v2) =>
      val cmp = PairOps.encode(t1, v1).compare(PairOps.encode(t2, v2))
      val expect = if (t1 != t2) java.lang.Long.compare(t1, t2)
        else java.lang.Double.compare(v1, v2)
      Integer.signum(cmp) == Integer.signum(expect)
    })
    // out-of-range timestamps fail loudly, not silently mis-sort
    intercept[IllegalArgumentException](PairOps.encode(PairOps.MinTs - 1, 0.0))
    intercept[IllegalArgumentException](PairOps.encode(PairOps.MaxTs + 1, 0.0))
    // long-pair variant: lexicographic order, second key unrestricted
    val anyLong = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    checkProp(Prop.forAll(tsGen, anyLong, tsGen, anyLong) { (a1, b1, a2, b2) =>
      val cmp = PairOps.encodeLongs(a1, b1).compare(PairOps.encodeLongs(a2, b2))
      val expect = if (a1 != a2) java.lang.Long.compare(a1, a2)
        else java.lang.Long.compare(b1, b2)
      Integer.signum(cmp) == Integer.signum(expect)
    })
  }

  test("fingerprint differential: fixture series distinct and stable") {
    // reference fixture storages/test/test.go:26-75 — 3 distinct series
    val fps = Seq(
      Seq(Label("__name__", "http_requests_total"), Label("code", "200"), Label("handler", "query")),
      Seq(Label("__name__", "http_requests_total"), Label("code", "400"), Label("handler", "query_range")),
      Seq(Label("__name__", "http_requests_total"), Label("code", "200"), Label("handler", "prometheus"))
    ).map(Fingerprint.of)
    assert(fps.distinct.size === 3)
    assert(fps.head === 0x145426e4f81508d1L)
  }
}
