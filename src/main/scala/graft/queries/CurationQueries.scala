package graft.queries

import graft.ext.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus curation pipeline as ONE declarative DAG:
  * quality gate → exact dedup keeper election → benchmark decontamination →
  * duplicated-span coverage (the ExactSubstr signal, reported per doc) →
  * deterministic split assignment, emitting the per-document manifest a
  * training dataloader consumes. Each stage exists (and is oracle-checked)
  * standalone — t5, d1, d7/d8, d11, sp1 — this operator is their
  * composition, the artifact a user of the engine actually ships.
  *
  * Scale shape (the point of composing in one DAG instead of four jobs):
  * the tokenized words array is computed ONCE and feeds the quality gate,
  * the token count, and the n-gram stage; Catalyst pushes the quality
  * filter below the dedup/contamination joins, so documents failing the
  * cheap map-side gate never reach a shuffle. What remains is one
  * content-hash aggregation (uniform keys, partial-agg), one broadcast
  * probe against the bounded benchmark n-gram set (the d8 Bloom pre-filter
  * is the drop-in when that set outgrows broadcast), and a map-side hash
  * split — no corpus-sized sort, window, or driver state anywhere. */
object CurationQueries {

  import QueryDef._

  private val cur1 = withOracle("cur1_curation_manifest",
    s"""WITH pool AS (
      |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 100 >= 5),
      |w AS (
      |  SELECT doc_id, lang, text,
      |         string_split_regex(lower(trim(text)), '\\s+') AS ws
      |  FROM pool),
      |gop AS (
      |  SELECT doc_id, lang, text, len(ws) AS n_tokens,
      |         (len(ws) BETWEEN 50 AND 100000
      |          AND cast(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE)
      |              / greatest(len(ws), 1) BETWEEN 3 AND 10
      |          AND cast(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |              / greatest(len(ws), 1) >= 0.8
      |          AND cast(len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
      |              / greatest(len(ws), 1) <= 0.1) AS ok
      |  FROM w),
      |keep AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id FROM pool GROUP BY 1),
      |ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1)),
      |                          i -> array_to_string(ws[i:i+3], ' ')))) AS g
      |  FROM w),
      |bw AS (
      |  SELECT string_split_regex(lower(trim(text)), '\\s+') AS ws
      |  FROM documents WHERE doc_id % 100 < 5),
      |bench AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1)),
      |                           i -> array_to_string(ws[i:i+3], ' ')))) AS g
      |  FROM bw),
      |contam AS (SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (g)),
      |${graft.queries.DedupQueries.spanCtes(graft.queries.DedupQueries.SpanWords, "pool")},
      |cov AS (SELECT doc_id, sum(e - s) AS dup_tokens FROM sp_mi GROUP BY doc_id)
      |SELECT gop.doc_id, gop.lang, gop.n_tokens,
      |       CAST((coalesce(cov.dup_tokens, 0) * 1000000)
      |            // greatest(gop.n_tokens, 1) AS BIGINT) AS span_cov_ppm,
      |       CASE WHEN substring(md5('split:' || gop.doc_id), 1, 4) < 'e666' THEN 'train'
      |            WHEN substring(md5('split:' || gop.doc_id), 1, 4) < 'f333' THEN 'val'
      |            ELSE 'test' END AS split
      |FROM gop
      |JOIN keep ON md5(gop.text) = keep.ch AND gop.doc_id = keep.keep_id
      |LEFT JOIN cov ON gop.doc_id = cov.doc_id
      |WHERE gop.ok
      |  AND gop.doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val pool = docs.where(col("doc_id") % 100 >= 5)
      .select(col("doc_id"), col("lang"), col("text"),
        words(col("text")).as("ws"))

    // t5's gopher gate (the one shared definition), over the shared words
    // array — gopherPassesWs so `ws` is computed once for gate + token
    // count + shingles.
    // r17 (guide §1.1/§1.2, measured twice): gop feeds three consumers
    // (keeper election, contamination probe, final projection). A
    // checkpoint of the WHOLE frame measured SLOWER (1.83 → 2.54 s): it
    // materializes the `ws` word arrays. The split below checkpoints only
    // the NARROW columns (doc_id, lang, ch, n_tokens, ok — what the
    // keeper election and the final projection need) and leaves the
    // ws-consuming contamination probe as its own single tokenize pass:
    // corpus tokenizations drop 3 → 2 with a doc-sized materialization.
    val gop = pool.select(col("doc_id"), col("lang"),
      md5(col("text").cast("binary")).as("ch"),
      size(col("ws")).as("n_tokens"),
      graft.ext.TextAnalysis.gopherPassesWs(col("ws")).as("ok"))
      .localCheckpoint(false)

    // d1's keeper election within the pool (groupBy + join, not a window:
    // partial-agg on uniform hash keys — a window over ch has no map-side
    // combine and a mass-duplicated family would sort inside one task)
    val keep = gop.groupBy("ch").agg(min("doc_id").as("keep_id"))

    // d7's contamination probe against the bounded benchmark n-gram set
    val bench = docs.where(col("doc_id") % 100 < 5)
      .select(words(col("text")).as("ws"))
      .select(explode(shingles(col("ws"), 4)).as("g"))
      .distinct()
    val contam = pool.select(col("doc_id"), explode(shingles(col("ws"), 4)).as("g"))
      .join(broadcast(bench), "g")
      .select("doc_id").distinct()

    // d11's duplicated-span coverage over the pool — REPORTED, not gated:
    // an exact-dup family's keeper legitimately carries coverage ≈ 1.0
    // (its twin duplicates every gram), so a hard coverage gate here
    // would undo the keeper election above. The manifest carries the
    // signal; a scrub stage (d12) or a corpus-level threshold consumes it.
    val cov = graft.queries.DedupQueries
      .mergedSpanExtents(docs.where(col("doc_id") % 100 >= 5)
        .select(col("doc_id"), col("text")), graft.queries.DedupQueries.SpanWords)
      .groupBy("doc_id").agg(sum(col("e") - col("s")).as("dup_tokens"))

    // sp1's deterministic split hash
    val p = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4)
    gop.where(col("ok"))
      .join(keep, "ch").where(col("doc_id") === col("keep_id"))
      .join(contam, Seq("doc_id"), "left_anti")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(p < "e666", "train").when(p < "f333", "val").otherwise("test").as("split"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        // exact-integer parts-per-million, same arithmetic both engines —
        // a rounded double ratio is engine-divergent at the last digit
        expr("dup_tokens * 1000000L div greatest(cast(n_tokens AS BIGINT), 1L)")
          .as("span_cov_ppm"),
        col("split"))
  }

  /** RP1: the dataset-card report — per-(source, lang) doc counts,
    * distinct-content counts (the dedup-aware size), token/char volume,
    * and the median document length. The numbers a data curator reads
    * before and after every pipeline change, and the strata weights a
    * mixing config consumes. One corpus scan: count/sum are partial-agg,
    * count(DISTINCT ch) plans Spark's two-phase expand — both exchanges
    * carry (source, lang[, ch]) keys, uniform and bounded, never the
    * corpus. percentile_disc is exact per stratum (q9 proved engine
    * parity); at 100 TB the one-line swap to dd_quantile partials (t8's
    * move) trades exactness for a mergeable sketch. */
  private val rp1 = withOracle("rp1_corpus_stats",
    """WITH w AS (
      |  SELECT source, lang, n_chars, md5(text) AS ch,
      |         len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
      |  FROM documents)
      |SELECT source, lang, count(*) AS n_docs,
      |       count(DISTINCT ch) AS n_distinct,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS median_tokens
      |FROM w GROUP BY source, lang""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"),
        md5(col("text").cast("binary")).as("ch"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("ch")).as("n_distinct"),
        sum("n_tokens").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
          .cast("long").as("median_tokens"))
  }

  /** RP2: cross-snapshot corpus diff — the "what changed between crawls"
    * report: per-doc added/removed/changed status between a base snapshot
    * and a new one (unchanged rows dropped — the delta manifest is the
    * output a downstream incremental pipeline consumes; d9 is the dedup
    * analogue of the same cross-snapshot discipline). Snapshots are
    * simulated from the one test table by id-range membership plus a
    * synthetic in-place edit. Scale shape: one full-outer equi-join on the
    * id — both sides shuffle once on a uniform key (with the
    * fingerprint-bucketed layout the join co-locates instead); content
    * equality compares md5 digests, never text, so the wide column is
    * projected away before the exchange. */
  private val rp2 = withOracle("rp2_corpus_diff",
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <= 8),
      |b AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 10 = 5 THEN 'v2:' || text ELSE text END) AS h
      |  FROM documents WHERE doc_id % 10 >= 1),
      |d AS (
      |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |         CASE WHEN a.doc_id IS NULL THEN 'added'
      |              WHEN b.doc_id IS NULL THEN 'removed'
      |              WHEN a.h <> b.h THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id, status FROM d WHERE status <> 'unchanged'""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val a = docs.where(col("doc_id") % 10 <= 8)
      .select(col("doc_id").as("a_id"), md5(col("text").cast("binary")).as("a_h"))
    val b = docs.where(col("doc_id") % 10 >= 1)
      .select(col("doc_id").as("b_id"),
        md5(when(col("doc_id") % 10 === 5, concat(lit("v2:"), col("text")))
          .otherwise(col("text")).cast("binary")).as("b_h"))
    a.join(b, col("a_id") === col("b_id"), "full_outer")
      .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
        when(col("a_id").isNull, "added")
          .when(col("b_id").isNull, "removed")
          .when(col("a_h") =!= col("b_h"), "changed")
          .otherwise("unchanged").as("status"))
      .where(col("status") =!= "unchanged")
  }

  /** CK1: document chunking — fixed 200-char windows with 50-char overlap
    * (stride 150), the context-window prep stage for RAG indexing and
    * long-document training. Emits (doc_id, chunk_idx, start, chunk_len,
    * chunk_hash): the hash verifies the actual substring content
    * cross-engine without hauling chunk text through the gate. Map-only:
    * explode(sequence(...)) is pipelined inside the scan stage exactly
    * like mm3's frame generator — per-row expansion, no shuffle, scales
    * linearly; chunk counts derive from length(text) so the operator is
    * self-contained. Every document yields ≥1 chunk (an empty text is one
    * empty chunk — the dataloader's empty-doc marker). */
  private val ck1 = withOracle("ck1_chunking",
    """WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
      |u AS (SELECT doc_id, t,
      |             unnest(range(0, CAST(ceil(greatest(length(t) - 50, 1) / 150.0) AS BIGINT))) AS gs
      |      FROM d)
      |SELECT doc_id, gs AS chunk_idx, 1 + gs * 150 AS start,
      |       length(substring(t, CAST(1 + gs * 150 AS INT), 200)) AS chunk_len,
      |       md5(substring(t, CAST(1 + gs * 150 AS INT), 200)) AS chunk_hash
      |FROM u""".stripMargin) { (s, dir) =>
    val t = coalesce(col("text"), lit(""))
    val nChunks = ceil(greatest(length(t) - 50, lit(1)).cast("double") / 150.0).cast("int")
    val chunk = col("t").substr(col("chunk_idx").cast("int") * 150 + 1, lit(200))
    Tables(s, dir, "documents")
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx").cast("long") * 150 + 1).as("start"),
        length(chunk).cast("long").as("chunk_len"),
        md5(chunk.cast("binary")).as("chunk_hash"))
  }

  /** CUR2: the training-MIX assembly pipeline as one DAG — the second
    * half of curation, downstream of cur1's cleaning: LM quality gate
    * (t9's scorer, shared verbatim — one definition, no drift) →
    * token-budget language mixing (sm4's shape at 50% of the surviving
    * tokens, en damped) → deterministic epoch order (sh1's two-pass
    * rank, seed "cur2") → packed global token offsets (pk1's distributed
    * prefix sum over the SHUFFLED order — the order the dataloader
    * actually consumes). Emits the per-document manifest row a training
    * job reads: (doc_id, lang, n_tokens, pos, offset).
    *
    * Scale composition notes: the LM gate and the budget filter are both
    * pushed below the ordering/packing stages by construction (they
    * filter before rank); the only corpus-sized exchanges are the LM
    * scoring joins (uniform token keys), the rank bucketing (uniform by
    * digest), and the pos-join that decorates offsets back onto the
    * manifest (dense uniform key). Docs with <2 words are unscorable and
    * dropped — a ≤1-token doc has no place in a training mix.
    *
    * The kept-mix frame is PERSISTED (TTL-memoized like d2's signature
    * table, registered for the same invalidation sweep): the ordering and
    * packing stages each run small driver-side planning actions
    * (bucket-count collects), and without a materialization point each
    * action would re-execute the whole LM-scoring subtree — measured 4×
    * the t9 cost. Selection is the natural checkpoint of a mix pipeline;
    * at 100 TB this is the manifest table a real pipeline writes anyway. */
  private val cur2KeptCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, Long)]()
  DedupQueries.registerCorpusCache(cur2KeptCache)

  /** The LM-GATE frame gets its own persist (r10): `kept` joins `gate`
    * against `rates`, and rates is itself an aggregate OF gate — so the
    * first kept materialization evaluated the gate subtree (whose LM
    * scoring explodes the corpus into bigrams ~3× inside one plan) twice
    * in one job. Invisible at gate-fixture size; measured at 1 M docs
    * (`Diag curate`, same fixture A/B): mix build 88.5 s → 48.2 s once
    * the gate — three narrow columns per doc — materializes once. */
  private val cur2GateCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, Long)]()
  DedupQueries.registerCorpusCache(cur2GateCache)

  private val cur2 = withOracle("cur2_training_mix",
    s"""WITH ${TextQueries.lmScoreCtes},
       |tok AS (
       |  SELECT doc_id, lang, len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
       |  FROM documents),
       |gate AS (
       |  SELECT tok.doc_id, tok.lang, tok.n_tokens
       |  FROM tok JOIN sc USING (doc_id) WHERE sc.lm_score >= -3.4),
       |c AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS toks,
       |             CASE lang WHEN 'en' THEN 1.0 ELSE 2.0 END AS w
       |      FROM gate GROUP BY lang),
       |tot AS (SELECT sum(w) AS sum_w, sum(toks) AS total_toks FROM c),
       |r AS (SELECT lang,
       |             least(1.0, ((total_toks * 0.5 * w) / sum_w) / toks) AS keep_rate
       |      FROM c CROSS JOIN tot),
       |kept AS (
       |  SELECT g.doc_id, g.lang, g.n_tokens
       |  FROM gate g JOIN r USING (lang)
       |  WHERE ('0x' || substring(md5('cur2mix:' || g.lang || ':' || g.doc_id), 1, 4))::INTEGER
       |          / 65536.0 < keep_rate),
       |ord AS (
       |  SELECT doc_id, lang, n_tokens,
       |         row_number() OVER (ORDER BY md5('cur2:' || doc_id), doc_id) - 1 AS pos
       |  FROM kept)
       |SELECT doc_id, lang, n_tokens, pos,
       |       CAST(coalesce(sum(n_tokens) OVER (ORDER BY pos
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
       |FROM ord""".stripMargin) { (s, dir) =>
    val sc = TextQueries.lmScores(s, dir)
    val tok = Tables(s, dir, "documents").select(
      col("doc_id"), col("lang"), size(words(col("text"))).as("n_tokens"))
    val gate = DedupQueries.memoizedPersisted(cur2GateCache, s, dir) {
      tok.join(sc.select(col("doc_id"), col("lm_score")), "doc_id")
        .where(col("lm_score") >= -3.4)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
    }
    val c = gate.groupBy("lang")
      .agg(sum(col("n_tokens")).cast("double").as("toks"))
      .withColumn("w", when(col("lang") === "en", 1.0).otherwise(2.0))
    val tot = c.agg(sum(col("w")).as("sum_w"), sum(col("toks")).as("total_toks"))
    val rates = c.crossJoin(broadcast(tot))
      .select(col("lang"),
        least(lit(1.0),
          col("total_toks") * 0.5 * col("w") / col("sum_w") / col("toks"))
          .as("keep_rate"))
    val u = conv(substring(md5(concat(lit("cur2mix:"), col("lang"), lit(":"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("int") / 65536.0
    val kept = DedupQueries.memoizedPersisted(cur2KeptCache, s, dir) {
      gate.join(broadcast(rates), "lang")
        .where(u < col("keep_rate"))
        .select(col("doc_id"), col("lang"), col("n_tokens"))
    }
    // r17 (guide §1.2/§5): `ordered` is consumed FOUR times — packOffsets'
    // bounds head, its per-bucket totals collect, its pass-2 frame, and
    // the final pos-join — and each consumption re-ran the md5-hash +
    // bucket-base join + rank window over the persisted kept frame. One
    // checkpoint of the narrow (doc_id, lang, n_tokens, pos) frame runs
    // the window once; every downstream action reads the materialization.
    val ordered = graft.ext.Shuffle.deterministicOrder(kept, "doc_id", "cur2")
      .localCheckpoint(false)
    val offsets = graft.ext.Packing
      .packOffsets(ordered, "pos", col("n_tokens"), blockSize = 2048L, buckets = 64)
      .select(col("pos"), col("offset"))
    ordered.join(offsets, "pos")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pos"), col("offset"))
  }

  /** RP3: distribution drift between corpus snapshots — per-language PSI
    * (population stability index) of the token-count distribution, NEW
    * batch (d9's split, `doc_id % 10 >= 8`) vs the curated BASE. The
    * standard "is today's ingest statistically like yesterday's corpus"
    * monitor: PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 investigate.
    * Deciles come from the BASE distribution (the reference population);
    * both sides are bucketed against those cuts and
    * psi = Σ_b (p_new − p_base)·ln(p_new/p_base) with Laplace-smoothed
    * proportions (+0.5 / +5.0) so empty buckets stay finite. Languages
    * with no base presence have no reference distribution and are
    * omitted (they surface in rp2's added-set instead).
    *
    * Scale shape: the decile aggregate is the one corpus-touching pass
    * (exact percentile_disc pins oracle semantics — the dd_quantile
    * partials swap is the same one-liner as t8 at 100 TB); cuts are
    * ≤ langs×9 and broadcast; bucketing is map-side; every downstream
    * frame is bounded by langs×2×10. round(4) masks summation-order and
    * ln ulp divergence (the t2/s5/t9 precedent). */
  private val rp3 = withOracle("rp3_dist_drift",
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |         len(string_split_regex(lower(trim(text)), '\s+')) AS t,
      |         doc_id % 10 >= 8 AS is_new
      |  FROM documents),
      |cuts AS (
      |  SELECT lang, quantile_disc(t, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
      |  FROM tok WHERE NOT is_new GROUP BY lang),
      |bk AS (
      |  SELECT tok.lang, tok.is_new, len(list_filter(cuts.cs, c -> c <= tok.t)) AS b
      |  FROM tok JOIN cuts USING (lang)),
      |cnt AS (SELECT lang, is_new, b, count(*) AS n FROM bk GROUP BY 1, 2, 3),
      |tot AS (SELECT lang, is_new, sum(n) AS tot FROM cnt GROUP BY 1, 2),
      |grid AS (
      |  SELECT c.lang, gb.b, gs.is_new
      |  FROM cuts c
      |  CROSS JOIN (SELECT unnest(range(10)) AS b) gb
      |  CROSS JOIN (SELECT unnest([true, false]) AS is_new) gs),
      |p AS (
      |  SELECT g.lang, g.b, g.is_new,
      |         (coalesce(cnt.n, 0) + 0.5) / (coalesce(tot.tot, 0) + 5.0) AS p
      |  FROM grid g
      |  LEFT JOIN cnt ON cnt.lang = g.lang AND cnt.is_new = g.is_new AND cnt.b = g.b
      |  LEFT JOIN tot ON tot.lang = g.lang AND tot.is_new = g.is_new),
      |nt AS (
      |  SELECT lang,
      |         CAST(coalesce(sum(CASE WHEN NOT is_new THEN tot END), 0) AS BIGINT) AS n_base,
      |         CAST(coalesce(sum(CASE WHEN is_new THEN tot END), 0) AS BIGINT) AS n_new
      |  FROM tot GROUP BY lang),
      |psi AS (
      |  SELECT pb.lang, round(sum((pn.p - pb.p) * ln(pn.p / pb.p)), 4) AS psi
      |  FROM p pb JOIN p pn ON pb.lang = pn.lang AND pb.b = pn.b
      |  WHERE NOT pb.is_new AND pn.is_new
      |  GROUP BY pb.lang)
      |SELECT c.lang, nt.n_base, nt.n_new, psi.psi
      |FROM cuts c JOIN nt USING (lang) JOIN psi USING (lang)""".stripMargin) { (s, dir) =>
    driftOf(s, Tables(s, dir, "documents"), TextQueries.sketchQuantilesEnabled(s))
  }

  /** rp3's body, parameterized by the quantile pass: exact
    * `percentile_disc` (oracle-pinned) or DDSketch partials
    * (`sketchQuantiles = true` / conf `spark.graft.sketchQuantiles`) —
    * constant-size mergeable per-group state, the 100 TB path. The decile
    * CUTS become α-approximate; every count downstream is still exact
    * against those cuts. Accuracy property in QueriesSpec. */
  def driftOf(s: SparkSession, docs: DataFrame,
      sketchQuantiles: Boolean = false): DataFrame = {
    val tok = docs.select(
      col("doc_id"), col("lang"),
      size(words(col("text"))).as("t"),
      (col("doc_id") % 10 >= 8).as("is_new"))
    if (sketchQuantiles) {
      // sketch path (the documented 100 TB swap): dd_hist consumes raw
      // instances, so the two-pass shape stays — cuts from the sketch
      // aggregate, bucketing against the broadcast cuts.
      val cuts = decileCuts(tok.where(!col("is_new")), sketchQuantiles = true)
      val bk = tok.join(broadcast(cuts), "lang")
        .select(col("lang"), col("is_new"),
          size(filter(col("cs"), c => c <= col("t"))).as("b"))
      val cnt = bk.groupBy("lang", "is_new", "b").agg(count(lit(1)).as("n"))
      psiFromBucketCounts(s, cnt)
    } else {
      // r17 (guide §1.2, exact path): the old shape evaluated `tok` twice
      // (decile aggregate + bucketing pass = two corpus tokenizes), and a
      // plain checkpoint of tok measured SLOWER (1.64 → 2.21 s — the
      // materialization exceeded the cheap recompute). Instead: ONE
      // corpus pass folds tok to per-(lang, side, token-count)
      // frequencies — bounded by langs × 2 × |distinct t|, NOT corpus
      // size — and both the decile cuts and the bucket counts derive
      // from that bounded frame. The cuts are computed driver-side with
      // integer-exact cume_dist arithmetic (smallest t with
      // 10·cum ≥ i·N — percentile_disc's definition; equality with the
      // aggregate form is pinned in QueriesSpec), the same bounded-model
      // move as the IVF centroids.
      val grouped = tok.groupBy(col("lang"), col("is_new"), col("t"))
        .agg(count(lit(1)).as("n")).localCheckpoint(false)
      val cutsByLang: Seq[(String, Seq[Int])] = grouped.where(!col("is_new"))
        .select("lang", "t", "n").collect()
        .groupBy(_.getString(0)).view.mapValues { rows =>
          discreteDeciles(rows.map(r => (r.getInt(1), r.getLong(2))).toSeq)
        }.toSeq.map { case (l, cs) => (l, cs) }
      if (cutsByLang.isEmpty)
        return psiFromBucketCounts(s,
          grouped.where(lit(false)).select(col("lang"), col("is_new"),
            lit(0).as("b"), col("n")))
      val cutsDf = s.createDataFrame(cutsByLang).toDF("lang", "cs")
      val cnt = grouped.join(broadcast(cutsDf), "lang")
        .select(col("lang"), col("is_new"),
          size(filter(col("cs"), c => c <= col("t"))).as("b"), col("n"))
        .groupBy("lang", "is_new", "b").agg(sum(col("n")).as("n"))
      psiFromBucketCounts(s, cnt)
    }
  }

  /** Exact discrete deciles over a (value, count) histogram — the
    * driver-side form of `percentile_disc(i/10)`: the smallest value
    * whose cumulative count clears i/10 of the total, in integer
    * arithmetic (10·cum ≥ i·N — no FP). Equality with the aggregate form
    * is pinned in QueriesSpec on real and synthetic corpora. */
  private[graft] def discreteDeciles(hist: Seq[(Int, Long)]): Seq[Int] = {
    val sorted = hist.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val cum = sorted.scanLeft(0L)(_ + _._2).tail
    (1 to 9).map(i => sorted(cum.indexWhere(c => 10L * c >= i.toLong * total))._1)
  }

  /** The reference population's decile cuts per language over a
    * `(lang, t)` frame — rp3's one corpus-touching pass, exposed so a
    * STREAMING new-side can bucket against batch-computed base cuts
    * (DocStream.driftCard). */
  private[graft] def decileCuts(tok: DataFrame,
      sketchQuantiles: Boolean): DataFrame =
    if (sketchQuantiles)
      tok.groupBy("lang")
        .agg(graft.functions.dd_hist(col("t").cast("double")).as("h"))
        .select(col("lang"), array((1 to 9).map(i =>
          graft.functions.dd_quantile(col("h"), i / 10.0)): _*).as("cs"))
    else tok.groupBy("lang").agg(
      array((1 to 9).map(i =>
        expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY t)")): _*).as("cs"))

  /** rp3's PSI fold over per-(lang, side, bucket) counts — everything
    * downstream of the corpus-touching passes, bounded by langs×2×10.
    * Shared verbatim between the batch monitor and the streaming card's
    * read-time fold so the two can never drift. */
  private[graft] def psiFromBucketCounts(s: SparkSession, cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy("lang", "is_new").agg(sum(col("n")).as("tot"))
    val grid = cnt.where(!col("is_new")).select("lang").distinct()
      .crossJoin(s.range(10).select(col("id").cast("int").as("b")))
      .crossJoin(s.range(2).select((col("id") === 1).as("is_new")))
    val p = grid
      .join(cnt, Seq("lang", "is_new", "b"), "left")
      .join(tot, Seq("lang", "is_new"), "left")
      .select(col("lang"), col("b"), col("is_new"),
        ((coalesce(col("n"), lit(0L)) + 0.5) /
          (coalesce(col("tot"), lit(0L)) + 5.0)).as("p"))
    val pb = p.where(!col("is_new")).select(col("lang"), col("b"), col("p").as("pb"))
    val pn = p.where(col("is_new")).select(col("lang"), col("b"), col("p").as("pn"))
    val psi = pb.join(pn, Seq("lang", "b"))
      .groupBy("lang")
      .agg(round(sum((col("pn") - col("pb")) * log(col("pn") / col("pb"))), 4).as("psi"))
    val nt = tot.groupBy("lang").agg(
      coalesce(sum(when(!col("is_new"), col("tot"))), lit(0L)).as("n_base"),
      coalesce(sum(when(col("is_new"), col("tot"))), lit(0L)).as("n_new"))
    // languages with a base presence — the ones that HAVE a reference
    // distribution (others surface in rp2's added-set instead)
    cnt.where(!col("is_new")).select("lang").distinct()
      .join(nt, "lang").join(psi, "lang")
      .select(col("lang"), col("n_base"), col("n_new"), col("psi"))
  }

  /** RP4: EMBEDDING-space drift — rp3's sibling for the representation
    * axis: per label, the cosine between the base slice's centroid and
    * the new batch's centroid (1 − cos is the drift), plus the raw L2
    * centroid shift and slice sizes. Token-count PSI (rp3) catches
    * length/stylistic drift; this catches semantic/topical drift the
    * length distribution can't see — the pair a dataset card reports
    * side by side. Same base/new convention as s7 (vec_id%10 ≥ 8 = new).
    *
    * Scale shape: ONE corpus pass (posexplode pipelined in the scan),
    * a (label × dim)-bounded partial aggregation (map-side combine
    * collapses each task to ≤ labels×dims rows), then everything
    * downstream operates on ≤ labels×dims rows — the s5 shape with the
    * cosine folded from per-dimension sums, never a list rebuilt. */
  /** Per-label base centroids as arrays — the batch-side artifact
    * [[graft.streaming.DocStream.embeddingDriftCard]] broadcasts (rp4's
    * base half, shaped for the live card). One bounded aggregation:
    * dim avg-partials per label, map-side combine, labels×1 rows out. */
  def labelCentroids(embeddings: DataFrame, dim: Int): DataFrame =
    embeddings.groupBy("label").agg(
      array((0 until dim).map(i =>
        avg(col("embedding")(i).cast("double"))): _*).as("cb"))

  private val rp4 = withOracle("rp4_embedding_drift",
    """WITH u AS (
      |  SELECT label, vec_id % 10 >= 8 AS is_new,
      |         generate_subscripts(embedding, 1) AS pos,
      |         unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |c AS (
      |  SELECT label, pos,
      |         avg(x) FILTER (WHERE NOT is_new) AS cb,
      |         avg(x) FILTER (WHERE is_new) AS cn
      |  FROM u GROUP BY label, pos),
      |d AS (
      |  SELECT label, sum(cb * cn) AS dp,
      |         sqrt(sum(cb * cb)) AS nb, sqrt(sum(cn * cn)) AS nn,
      |         sqrt(sum((cb - cn) * (cb - cn))) AS l2
      |  FROM c GROUP BY label),
      |k AS (
      |  SELECT label,
      |         count(*) FILTER (WHERE vec_id % 10 < 8) AS n_base,
      |         count(*) FILTER (WHERE vec_id % 10 >= 8) AS n_new
      |  FROM embeddings GROUP BY label)
      |SELECT d.label, k.n_base, k.n_new,
      |       round(d.dp / (d.nb * d.nn), 6) AS centroid_cos,
      |       round(d.l2, 6) AS centroid_l2
      |FROM d JOIN k USING (label)""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "embeddings")
    val u = e.select(col("label"), (col("vec_id") % 10 >= 8).as("is_new"),
      posexplode(transform(col("embedding"), _.cast("double"))))
    val c = u.groupBy("label", "pos").agg(
      avg(when(!col("is_new"), col("col"))).as("cb"),
      avg(when(col("is_new"), col("col"))).as("cn"))
    val d = c.groupBy("label").agg(
      sum(col("cb") * col("cn")).as("dp"),
      sqrt(sum(col("cb") * col("cb"))).as("nb"),
      sqrt(sum(col("cn") * col("cn"))).as("nn"),
      sqrt(sum((col("cb") - col("cn")) * (col("cb") - col("cn")))).as("l2"))
    val k = e.groupBy("label").agg(
      count(when(col("vec_id") % 10 < 8, 1)).as("n_base"),
      count(when(col("vec_id") % 10 >= 8, 1)).as("n_new"))
    d.join(k, "label")
      .select(col("label"), col("n_base"), col("n_new"),
        round(col("dp") / (col("nb") * col("nn")), 6).as("centroid_cos"),
        round(col("l2"), 6).as("centroid_l2"))
  }

  /** CUR3: the LINE-granularity prep pipeline as one DAG — C4 clean (t10's
    * rule engine, page drops included) feeding corpus-wide duplicated-line
    * removal (d13's count→prune) over only the SURVIVING lines, reassembled
    * into the final per-doc text with the stage counters a curation report
    * needs. Each stage is oracle-checked standalone (t10, d13); this is
    * their composition — the "clean then deduplicate what survived"
    * ordering every published pipeline (C4, MassiveText, RefinedWeb) uses,
    * where dedup counts must NOT include lines the cleaner already killed.
    *
    * Scale shape: page rejection never plans a Filter over the computed
    * line arrays — rejected pages collapse to zero rows INSIDE the explode
    * (`posexplode(when(page_kept, lines))`: the s6 lesson applied to a
    * pipeline join point). Downstream is exactly d13's shape: line-keyed
    * partial-agg count, AQE-broadcast dup sliver, doc-keyed reassembly
    * with the kept-line election inside the aggregate. */
  private val cur3 = withOracle("cur3_line_prep",
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 4 = 0
      |              THEN 'subscribe to our newsletter for updates and offers ' || text
      |              ELSE text END AS text
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM d),
      |l AS (
      |  SELECT doc_id,
      |         list_transform(range(0, greatest(CAST(ceil(len(ws) / 8.0) AS BIGINT), 1)),
      |           i -> array_to_string(ws[i*8+1 : i*8+8], ' ')
      |                || CASE WHEN (doc_id + 3*i) % 10 = 7 THEN ' javascript' ELSE '' END
      |                || CASE WHEN (doc_id * 7 + i) % 37 = 0 THEN ' {' ELSE '' END
      |                || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END) AS lines
      |  FROM w),
      |k AS (
      |  SELECT doc_id, lines,
      |         list_filter(lines, x -> len(string_split(x, ' ')) >= 5
      |                               AND ends_with(x, '.')
      |                               AND NOT contains(x, 'javascript')) AS kept
      |  FROM l),
      |kl AS (
      |  SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
      |         unnest(range(0, len(kept))) AS i,
      |         unnest(kept) AS line
      |  FROM k
      |  WHERE len(list_filter(lines, x -> contains(x, '{'))) = 0 AND len(kept) >= 3),
      |c AS (SELECT line, count(*) AS cnt FROM kl GROUP BY 1)
      |SELECT doc_id,
      |       min(n_lines) AS n_lines,
      |       min(n_kept) AS n_kept,
      |       CAST(sum(CASE WHEN cnt > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_removed,
      |       coalesce(array_to_string(list(line ORDER BY i) FILTER (WHERE cnt <= 2),
      |                chr(10)), '') AS final_text
      |FROM kl JOIN c USING (line)
      |GROUP BY doc_id""".stripMargin) { (s, dir) =>
    // every 4th doc gets a chunk-aligned boilerplate sentence planted in
    // its TEXT (the corpus repeats nothing naturally): it survives the
    // cleaner only where it draws terminal punctuation — so the dedup
    // counts see exactly what the cleaner let through, pinning the
    // clean-BEFORE-count ordering
    val docs = Tables(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("subscribe to our newsletter for updates and offers "), col("text")))
        .otherwise(col("text")).as("text"))
    val c4 = TextQueries.c4CleanOf(docs)
    // rejected pages vanish inside the explode — no Filter over the HOF
    // columns, no pushdown cloning (posexplode of an empty array emits
    // nothing; `when` without otherwise gives null, also nothing).
    // r17 (guide §1.2): kl feeds BOTH the corpus-wide line count and the
    // reassembly join — unmaterialized, the whole boilerplate-plant +
    // C4-clean + explode subtree evaluated twice in one plan (two full
    // `documents` scans in the before-plan). localCheckpoint runs it
    // once; at 100 TB this is the cleaned-line table the pipeline lands
    // between its clean and dedup stages anyway (d13's discipline).
    val kl = c4.select(col("doc_id"), col("n_lines"), col("n_kept"),
        posexplode(when(col("page_kept"), split(col("cleaned"), "\n")))
          .as(Seq("i", "line")))
      .localCheckpoint(false)
    val dup = kl.groupBy("line").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > DedupQueries.DupLineMax)
    kl.join(dup, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        min(col("n_lines")).as("n_lines"),
        min(col("n_kept")).as("n_kept"),
        sum(when(col("cnt").isNotNull, 1L).otherwise(0L)).as("n_dup_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(col("cnt").isNull,
              struct(col("i"), col("line"))))),
            _.getField("line")),
          "\n").as("final_text"))
  }

  /** URL1 — URL canonicalization + domain/word filtering, the stage a web
    * corpus pipeline runs BEFORE any text is fetched or scored (the
    * RefinedWeb §3.1 / C4 front gate: normalize the crawl URL, drop
    * blocklisted registered domains and smut-worded URLs). The documents
    * table carries no crawl URL, so one is synthesized deterministically
    * from (doc_id, source, lang) with the mess real crawls have — mixed
    * scheme/host case, explicit default port, utm_* tracking params,
    * fragments — and BOTH engines normalize it independently:
    *
    *   1. strip the fragment;
    *   2. lowercase scheme + host (never the path — paths are
    *      case-sensitive);
    *   3. drop the default `:443` port;
    *   4. drop `utm_*` tracking params and any dangling `?`/`&`.
    *
    * The registered domain joins against a blocklist via a BROADCAST
    * left join — the literal 3-row list stands in for the millions-row
    * UT1-style blocklists this shape is built for (map-side probe, the
    * corpus never shuffles); the word filter is a pure projection. Every
    * step is whole-stage-codegen string expressions — zero exchanges in
    * the whole operator (PlanSpec contract). */
  /** The url1 gate over any (doc_id, lang, source) frame — synthesis +
    * normalization + blocklist/word scoring as one codegen projection plus
    * the broadcast probe. Factored so Diag can measure it at corpus sizes
    * the gate fixture can't show. */
  def urlGateOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val pathWord = element_at(
      array(lit("news"), lit("blog"), lit("casino"),
        lit("download"), lit("poker"), lit("docs")),
      (col("doc_id") % 6).cast("int") + 1)
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
      lit("://"), col("lang"), lit("."),
      when(col("doc_id") % 3 === 0, upper(col("source"))).otherwise(col("source")),
      lit("-site.com"),
      when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/"), pathWord, lit("-"), (col("doc_id") % 97).cast("string"),
      when(col("doc_id") % 4 === 0,
        concat(lit("?utm_source=feed&ref="), (col("doc_id") % 13).cast("string")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("?ref="), (col("doc_id") % 13).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("#section-2")).otherwise(lit("")))
    val nofrag = regexp_replace(url, "#.*$", "")
    val withHead = docs
      .select(col("doc_id"), nofrag.as("nofrag"))
      .withColumn("head", lower(regexp_extract(col("nofrag"), "^[^/]+://[^/]+", 0)))
    val norm = withHead.select(
      col("doc_id"),
      concat(
        regexp_replace(col("head"), ":443$", ""),
        regexp_replace(
          regexp_replace(
            col("nofrag").substr(length(col("head")) + 1, length(col("nofrag"))),
            "utm_[a-z_]+=[^&#]*&?", ""),
          "[?&]$", "")).as("url_norm"),
      regexp_extract(regexp_replace(col("head"), ":443$", ""),
        "[^./:]+\\.[^./:]+$", 0).as("domain"))
    val scored = norm.withColumn("bad_hits",
      (when(col("url_norm").contains("casino"), 1).otherwise(0) +
        when(col("url_norm").contains("poker"), 1).otherwise(0) +
        when(col("url_norm").contains("bet365"), 1).otherwise(0)).cast("int"))
    // broadcast probe against the domain blocklist: the literal frame
    // stands in for a UT1-scale table — the corpus side never shuffles
    val blocklist = broadcast(s.createDataFrame(
      Seq("src3-site.com", "src7-site.com", "src13-site.com").map(Tuple1.apply))
      .toDF("domain").withColumn("bl", lit(1)))
    scored.join(blocklist, Seq("domain"), "left")
      .select(col("doc_id"), col("url_norm"), col("domain"), col("bad_hits"),
        (col("bl").isNotNull || col("bad_hits") >= 1).cast("int").as("blocked"))
  }

  private val url1 = withOracle("url1_url_filter",
    """WITH u AS (
      |  SELECT doc_id,
      |         (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
      |         lang || '.' ||
      |         (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
      |         '-site.com' ||
      |         (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) || '/' ||
      |         (CASE CAST(doc_id % 6 AS INT)
      |            WHEN 0 THEN 'news' WHEN 1 THEN 'blog' WHEN 2 THEN 'casino'
      |            WHEN 3 THEN 'download' WHEN 4 THEN 'poker' ELSE 'docs' END) ||
      |         '-' || (doc_id % 97) ||
      |         (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=' || (doc_id % 13)
      |               WHEN doc_id % 4 = 2 THEN '?ref=' || (doc_id % 13)
      |               ELSE '' END) ||
      |         (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
      |  FROM documents),
      |n1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
      |sp AS (
      |  SELECT doc_id, nofrag,
      |         lower(regexp_extract(nofrag, '^[^/]+://[^/]+')) AS head
      |  FROM n1),
      |norm AS (
      |  SELECT doc_id,
      |         regexp_replace(head, ':443$', '') ||
      |         regexp_replace(regexp_replace(substr(nofrag, length(head) + 1),
      |                                       'utm_[a-z_]+=[^&#]*&?', ''),
      |                        '[?&]$', '') AS url_norm,
      |         regexp_extract(regexp_replace(head, ':443$', ''),
      |                        '[^./:]+\.[^./:]+$') AS domain
      |  FROM sp),
      |scored AS (
      |  SELECT doc_id, url_norm, domain,
      |         CAST((CASE WHEN contains(url_norm, 'casino') THEN 1 ELSE 0 END) +
      |              (CASE WHEN contains(url_norm, 'poker') THEN 1 ELSE 0 END) +
      |              (CASE WHEN contains(url_norm, 'bet365') THEN 1 ELSE 0 END)
      |              AS INT) AS bad_hits
      |  FROM norm)
      |SELECT doc_id, url_norm, domain, bad_hits,
      |       CAST((domain IN ('src3-site.com', 'src7-site.com', 'src13-site.com')
      |             OR bad_hits >= 1) AS INT) AS blocked
      |FROM scored""".stripMargin) { (s, dir) =>
    urlGateOf(Tables(s, dir, "documents").select("doc_id", "lang", "source"))
  }

  val all: Seq[QueryDef] = Seq(cur1, rp1, rp2, ck1, cur2, rp3, rp4, cur3, url1)
}
