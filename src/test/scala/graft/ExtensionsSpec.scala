package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the custom kernels: `GraftFunctions.register` on a live
  * session and `GraftExtensions` via `spark.sql.extensions` must both make
  * every kernel callable from `spark.sql`, with results identical to the
  * Column API. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    graft.plans.Engine.install(s)
    s
  }

  private def one(sql: String): Row = spark.sql(sql).collect().head

  test("scalar kernels are callable from SQL and match the Column API") {
    import org.apache.spark.sql.functions._
    import graft.ext.extfunctions._
    import graft.functions.{labels_fingerprint, labels_json}

    val df = spark.sql(
      """SELECT map('__name__', 'up', 'job', 'node') AS labels,
        |       array('a', 'b', 'a', 'c') AS ws,
        |       array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS e1,
        |       array(CAST(2.0 AS FLOAT), CAST(1.0 AS FLOAT)) AS e2
        |""".stripMargin)
    df.createOrReplaceTempView("ext_probe")

    val viaSql = one(
      """SELECT labels_fingerprint(labels) AS fp,
        |       labels_json(labels) AS lj,
        |       cosine_sim(e1, e2) AS cos,
        |       dot_f(e1, e2) AS dot,
        |       jaccard_sim(ws, array('a', 'z')) AS jac,
        |       minhash_signature(ws, 16) AS mh,
        |       simhash64(ws) AS sh,
        |       word_shingles(ws, 2) AS sh2,
        |       repetition_stats(ws, 2) AS rep,
        |       lsh_buckets(e1, 4, 8) AS lsh,
        |       rolling_fingerprint('abcdefghij', 4, 2) AS rfp,
        |       ts_val_ts(ts_val_encode(42L, 1.5D)) AS ts_back,
        |       ts_val_v(ts_val_encode(42L, 1.5D)) AS v_back
        |FROM ext_probe""".stripMargin)

    val viaCols = df.select(
      labels_fingerprint(col("labels")).as("fp"),
      labels_json(col("labels")).as("lj"),
      cosine_sim(col("e1"), col("e2")).as("cos"),
      dot_f(col("e1"), col("e2")).as("dot"),
      jaccard_sim(col("ws"), array(lit("a"), lit("z"))).as("jac"),
      minhash_signature(col("ws"), 16).as("mh"),
      simhash64(col("ws")).as("sh"),
      word_shingles(col("ws"), 2).as("sh2"),
      repetition_stats(col("ws"), 2).as("rep"),
      lsh_buckets(col("e1"), 4, 8).as("lsh"),
      rolling_fingerprint(lit("abcdefghij"), 4, 2).as("rfp")
    ).collect().head

    assert(viaSql.getLong(0) === viaCols.getLong(0))
    assert(viaSql.getString(1) === viaCols.getString(1))
    assert(viaSql.getString(1) === """{"__name__":"up","job":"node"}""")
    assert(viaSql.getDouble(2) === viaCols.getDouble(2))
    assert(viaSql.getDouble(3) === viaCols.getDouble(3))
    assert(viaSql.getDouble(4) === viaCols.getDouble(4))
    assert(viaSql.getSeq[Long](5) === viaCols.getSeq[Long](5))
    assert(viaSql.getLong(6) === viaCols.getLong(6))
    assert(viaSql.getSeq[String](7) === viaCols.getSeq[String](7))
    assert(viaSql.getStruct(8) === viaCols.getStruct(8))
    assert(viaSql.getSeq[Long](9) === viaCols.getSeq[Long](9))
    assert(viaSql.getSeq[Long](10) === viaCols.getSeq[Long](10))
    assert(viaSql.getLong(11) === 42L)
    assert(viaSql.getDouble(12) === 1.5)
  }

  test("DDSketch aggregates compose from SQL: dd_hist → merge → quantile") {
    spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS v", "id % 4 AS g")
      .createOrReplaceTempView("ext_vals")
    val q = one(
      """SELECT dd_quantile(dd_hist_merge(h), 0.5) AS p50
        |FROM (SELECT g, dd_hist(v) AS h FROM ext_vals GROUP BY g)""".stripMargin)
    // DDSketch guarantees relative error alpha (=0.01 default) vs exact 499/500
    assert(math.abs(q.getDouble(0) - 499.5) / 499.5 < 0.02)
  }

  test("freq_sketch aggregates compose from SQL: sketch → merge → items/n") {
    spark.range(3000).selectExpr("concat('t', id % 50) AS term", "id % 4 AS g")
      .createOrReplaceTempView("freq_terms")
    // 50 distinct terms, capacity 256 → exact regime: 60 each
    val r = one(
      """SELECT freq_n(s) AS n, freq_items(s)[0].est AS top_est,
        |       size(freq_items(s)) AS n_terms
        |FROM (SELECT freq_sketch_merge(p) AS s
        |      FROM (SELECT g, freq_sketch(term) AS p FROM freq_terms GROUP BY g))""".stripMargin)
    assert(r.getLong(0) === 3000L)
    assert(r.getLong(1) === 60L)
    assert(r.getInt(2) === 50)
  }

  test("bloom_agg/bloom_might_contain compose from SQL: no false negatives, prunes strangers") {
    spark.range(1000).selectExpr("concat('member ', id) AS g")
      .createOrReplaceTempView("bloom_members")
    spark.range(20000).selectExpr("concat('stranger ', id) AS g")
      .createOrReplaceTempView("bloom_strangers")
    // the bloom side must be foldable or a scalar subquery (same contract
    // as Spark's own runtime-filter injection)
    val kept = one(
      """SELECT (SELECT count(*) FROM bloom_members
        |        WHERE bloom_might_contain(
        |          (SELECT bloom_agg(xxhash64(g)) FROM bloom_members),
        |          xxhash64(g))) AS members_kept,
        |       (SELECT count(*) FROM bloom_strangers
        |        WHERE bloom_might_contain(
        |          (SELECT bloom_agg(xxhash64(g)) FROM bloom_members),
        |          xxhash64(g))) AS strangers_kept""".stripMargin)
    assert(kept.getLong(0) === 1000L) // no false negatives, ever
    assert(kept.getLong(1) < 20000 * 0.05, s"fp survivors: ${kept.getLong(1)}")
  }

  test("literal-argument validation raises a clear error from SQL") {
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), CAST(rand() * 4 AS INT))").collect()
    }
    assert(msgs(e).contains("foldable"), msgs(e))
    val a = intercept[Exception] { spark.sql("SELECT simhash64()").collect() }
    assert(msgs(a).contains("argument"), msgs(a))
  }

  test("every kernel in the registration table resolves in the session registry") {
    // samples above exercise semantics; this guards COMPLETENESS — a new
    // kernel added to the Column API but forgotten in GraftFunctions.all
    // would silently lack a SQL name (and rawsql access)
    val reg = org.apache.spark.sql.graftbridge.functionRegistry(spark)
    graft.plans.GraftFunctions.all.foreach { case (ident, _, _) =>
      assert(reg.functionExists(ident), s"${ident.funcName} not registered")
    }
    assert(graft.plans.GraftFunctions.all.size >= 21)
  }

  test("GraftExtensions installs functions and the nanos pushdown rule at build time") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // `config("spark.sql.extensions", …)` is a STATIC conf — getOrCreate
      // reads it from the SparkContext's conf, so over the suite's shared
      // context it would be ignored. withExtensions applies the same
      // injection path the config triggers on a fresh context.
      val s2 = org.apache.spark.sql.classic.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
      assert(s2 ne spark) // a genuinely new session over the shared context
      // functions present without any register() call
      val r = s2.sql("SELECT simhash64(array('a', 'b')) AS h").collect().head
      assert(r.getLong(0) === spark.sql("SELECT simhash64(array('a', 'b'))").collect().head.getLong(0))
      // the injected optimizer rule derives a pushable raw-long bound from a
      // timestamp predicate over timestamp_micros(ns DIV 1000) — exercised
      // on a synthesized raw-ns parquet (the shape older testdata shipped;
      // a real scan: a LocalRelation would be constant-folded away whole)
      val nsDir = java.nio.file.Files.createTempDirectory("graft_ns_").toString
      s2.range(0, 100)
        .select((org.apache.spark.sql.functions.lit(1699900000000000000L) +
          org.apache.spark.sql.functions.col("id") * 1000000000L).as("ts"))
        .write.mode("overwrite").parquet(nsDir)
      val df = s2.read.parquet(nsDir)
        .withColumn("ts_us", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
        .where("ts_us >= TIMESTAMP'2023-11-14 00:00:00'")
      // 2023-11-14T00:00:00Z = 1699920000 s → derived raw-ns bound
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("1699920000000000000"),
        s"expected derived raw-ns bound in:\n$optimized")
      // and the NTZ-identity-cast case on the real events table when the
      // current testdata ships native TIMESTAMP(MICROS): the rule conjoins
      // a bound directly on the raw NTZ attribute (no cast around it)
      val rawTs = s2.read.parquet("/root/testdata/sf0.001/events.parquet").schema("ts")
      if (rawTs.dataType == org.apache.spark.sql.types.TimestampNTZType) {
        val dfn = graft.queries.Tables.events(s2, "/root/testdata/sf0.001")
          .where("ts >= TIMESTAMP'2023-11-14 00:00:00'")
        val on = dfn.queryExecution.optimizedPlan.toString
        assert("""ts#\d+ >= 2023-11-14""".r.findFirstIn(on).nonEmpty,
          s"expected derived raw-NTZ bound in:\n$on")
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
