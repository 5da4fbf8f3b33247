package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF(+int8) ANN serving index — the artifact rung past the
  * inline train-per-query stages in [[graft.queries.SimilarityQueries]]:
  * train ONCE, write the codebook + cell-partitioned codes, and let every
  * subsequent query read only its probed cells. (Reference anchor: the
  * in-memory series index snapshot+reload pattern, clickhouse.go:155-204
  * — the same build-an-artifact-then-serve shape, here for vectors.)
  *
  * Layout under `path`:
  *   centroids/            (cell INT, cv ARRAY<DOUBLE>) — nlist rows
  *   codes/cell=N/…        (vec_id, embedding, mn, mx, codes) — the corpus,
  *                         DIRECTORY-partitioned by IVF cell
  *   _INDEX_SUCCESS        commit marker, written LAST
  *
  * Scale shape:
  *  - The build is one KMeans pass (a bounded one-off; at 100 TB train on
  *    a sample — centroid quality is statistical, not per-row) plus ONE
  *    corpus exchange: the cell repartition that becomes the directory
  *    layout. Files are written cell-sorted by vec_id under zstd, so the
  *    artifact's bytes are deterministic for a fixed (corpus, nlist, seed).
  *  - SERVING an nprobe query reads ONLY the probed cells' directories —
  *    partition pruning, pinned in PlanSpec — and inside them the int8
  *    code columns are ¼ the bytes of the float array for a candidate
  *    stage that never touches full precision (s6's discipline; the
  *    `embedding` column is read only for the bounded re-rank set).
  *  - Each table write is an independent Spark parquet job (its own
  *    `_SUCCESS`); the artifact SET commits atomically via the final
  *    `_INDEX_SUCCESS` marker (tmp + rename, the merges.txt discipline),
  *    so [[committed]] never admits a half-built index and a rebuild in
  *    place is observable only at marker flip.
  *
  * The int8 columns are exactly s4's oracle-checked quantization (per-
  * vector min/max affine, ties-away-from-zero) so a reader can mix served
  * and inline stages bit-for-bit.
  */
object AnnIndex {

  /** Train centroids on `embeddings` (vec_id, embedding ARRAY<FLOAT>) and
    * write the full artifact set under `path`. Returns the centroid
    * arrays (cell-ordered) so a caller composing build+serve in one job
    * skips the re-read. With `pq = true` (default) the codes table also
    * carries the PQ columns (`pq_codes`, `pq_rnrm` — the code-only norm,
    * exact because subspaces are disjoint coordinates) and the artifact
    * gains `pq_codebooks/`, so the s8-shaped ADC query serves from codes
    * alone. */
  def write(spark: SparkSession, embeddings: DataFrame, path: String,
      nlist: Int = 16, seed: Long = 42L, maxIter: Int = 5,
      pq: Boolean = true): Seq[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.queries.SimilarityQueries.{nearestCell, pqCodebooksOf, PqM}
    val marker = new org.apache.hadoop.fs.Path(s"$path/_INDEX_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = acquireBuildLock(spark, path)
    try {
    if (fs.exists(marker)) fs.delete(marker, false) // rebuild: uncommit first

    val e = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter).fit(e)
    val cents = model.clusterCenters.map(_.toArray).toSeq

    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "cv")
      .coalesce(1).sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/centroids")

    val pqCb = if (pq) Some(pqCodebooksOf(embeddings)) else None
    pqCb.foreach { cb =>
      cb.zipWithIndex.flatMap { case (mk, mi) =>
        mk.zipWithIndex.map { case (c, ki) => (mi, ki, c.toSeq) }
      }.toSeq.toDF("m", "k", "cv")
        .coalesce(1).sortWithinPartitions("m", "k")
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$path/pq_codebooks")
    }

    // cell assignment at build time (the model's own transform — identical
    // to the inline s3 assignment); int8 codes are s4's exact formula;
    // PQ encode = one argmin fold per subspace (s7's kernel) with the
    // code-only norm precomputed — all write-side columns
    val v = transform(col("embedding"), _.cast("double"))
    val base = model.transform(e)
      .select(col("vec_id"), col("embedding"),
        col("prediction").cast("int").as("cell"), v.as("v"))
      .select(col("vec_id"), col("embedding"), col("cell"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"), col("v"))
      .select(col("vec_id"), col("embedding"), col("cell"),
        col("mn"), col("mx"),
        transform(col("v"), x =>
          when(col("mx") === col("mn"), lit(0))
            .otherwise(round((x - col("mn")) * 255 / (col("mx") - col("mn")), 0)
              .cast("int"))).as("codes"), col("v"))
    val coded = pqCb match {
      case None => base.drop("v")
      case Some(cb) =>
        val sub = cb(0)(0).length
        val cn2Lit = array(cb.map(mk =>
          array(mk.map(c => lit(c.map(x => x * x).sum)): _*)): _*)
        val seqM = sequence(lit(0), lit(PqM - 1))
        base
          .withColumn("pq_codes", array((0 until PqM).map { mi =>
            nearestCell(slice(col("v"), mi * sub + 1, sub), cb(mi).toIndexedSeq)
          }: _*))
          .withColumn("pq_rnrm", sqrt(aggregate(
            transform(seqM, m => element_at(element_at(cn2Lit, m + 1),
              element_at(col("pq_codes"), m + 1) + 1)),
            lit(0.0), _ + _)))
          .drop("v")
    }
    coded
      .repartition(nlist, col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .write.mode("overwrite").partitionBy("cell")
      .option("compression", "zstd")
      .parquet(s"$path/codes")

    // commit marker LAST — tmp + rename so a crash mid-build never leaves
    // a committed-looking artifact, and readers flip atomically
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/._INDEX_SUCCESS.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(s"nlist=$nlist seed=$seed\n".getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, marker)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"index commit rename failed: $tmp -> $marker")
    }
    cents
    } finally releaseBuildLock(spark, path, lock)
  }

  /** Mutation guard: one builder at a time per index path. Two concurrent
    * [[write]]s (or a write racing an [[append]]) would interleave table
    * overwrites — an appender could encode against centroids a rebuilder
    * is replacing. Exclusive-create lock with an ownership token (the
    * rollup-claim discipline, streaming/Downsample.scala): O_EXCL on
    * local, create(overwrite=false) on HDFS; a second builder fails FAST
    * and LOUD (index builds are long — queueing silently would hide an
    * operational error); a stale lock from a dead builder is broken
    * after `graft.ann.lockStaleMs` (default 1 h — longer than any sane
    * build of one index) and only then retried once. */
  private def acquireBuildLock(spark: SparkSession, path: String): String = {
    val lock = new org.apache.hadoop.fs.Path(s"$path/._INDEX_LOCK")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lock.getParent)
    val token = java.util.UUID.randomUUID().toString
    val staleMs = spark.conf.getOption("graft.ann.lockStaleMs")
      .map(_.toLong).getOrElse(3600000L)
    def tryOnce(): Boolean =
      try {
        fs match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            val lp = java.nio.file.Paths.get(lock.toUri.getPath)
            java.nio.file.Files.createFile(lp)
            java.nio.file.Files.write(lp, token.getBytes("UTF-8"))
          case _ =>
            val out = fs.create(lock, false)
            try out.write(token.getBytes("UTF-8")) finally out.close()
        }
        true
      } catch { case _: java.io.IOException => false }
    if (tryOnce()) return token
    val st = try Some(fs.getFileStatus(lock)) catch {
      case _: java.io.FileNotFoundException => None
    }
    val stale = st.exists(s => System.currentTimeMillis() - s.getModificationTime > staleMs)
    if (stale) { fs.delete(lock, false); if (tryOnce()) return token }
    throw new IllegalStateException(
      s"ANN index at $path is being built by another process (lock $lock); " +
        "concurrent builds would interleave table overwrites. If the holder is " +
        "dead, delete the lock (it auto-breaks after graft.ann.lockStaleMs).")
  }

  private def releaseBuildLock(spark: SparkSession, path: String,
      token: String): Unit = {
    val lock = new org.apache.hadoop.fs.Path(s"$path/._INDEX_LOCK")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // delete only a lock we still own (a stale-break may have replaced it)
    val mine = try {
      val in = fs.open(lock)
      try new String(in.readAllBytes(), "UTF-8").trim == token finally in.close()
    } catch { case _: java.io.IOException => false }
    if (mine) fs.delete(lock, false)
  }

  /** Incremental maintenance — the index's daily-ingest path (the reason
    * the inline s7 assignment stage exists, now against the real
    * artifact): assign `newEmbeddings` to the FROZEN centroids entirely
    * map-side ([[graft.queries.SimilarityQueries.nearestCell]] — zero
    * exchanges beyond the cell-partitioned append, zero retraining),
    * quantize with s4's formula, PQ-encode with the STORED codebooks,
    * and append into the existing cell directories. Centroids stay
    * frozen by design: cell quality degrades only as the data
    * distribution drifts, and a periodic [[write]] rebuild re-trains —
    * the classic IVF maintenance contract. The marker drops for the
    * duration and re-commits after, so [[committed]] readers never see a
    * half-appended index; a crash mid-append leaves it uncommitted
    * (rebuild or re-append to recover). Callers must not append a
    * vec_id already in the index (the store's series-dedup discipline
    * applies upstream). */
  def append(spark: SparkSession, path: String, newEmbeddings: DataFrame): Unit = {
    import graft.queries.SimilarityQueries.{nearestCell, PqM}
    val lockTok = acquireBuildLock(spark, path)
    try {
    val cents = readCentroids(spark, path)
    val hasPq = {
      val p = new org.apache.hadoop.fs.Path(s"$path/pq_codebooks")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val pqCb = if (hasPq) Some(readPqCodebooks(spark, path)) else None
    val marker = new org.apache.hadoop.fs.Path(s"$path/_INDEX_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(marker, false)

    val v = transform(col("embedding"), _.cast("double"))
    val base = newEmbeddings
      .select(col("vec_id"), col("embedding"),
        nearestCell(v, cents).cast("int").as("cell"), v.as("v"))
      .select(col("vec_id"), col("embedding"), col("cell"),
        array_min(col("v")).as("mn"), array_max(col("v")).as("mx"), col("v"))
      .select(col("vec_id"), col("embedding"), col("cell"),
        col("mn"), col("mx"),
        transform(col("v"), x =>
          when(col("mx") === col("mn"), lit(0))
            .otherwise(round((x - col("mn")) * 255 / (col("mx") - col("mn")), 0)
              .cast("int"))).as("codes"), col("v"))
    val coded = pqCb match {
      case None => base.drop("v")
      case Some(cb) =>
        val sub = cb(0)(0).length
        val cn2Lit = array(cb.map(mk =>
          array(mk.map(c => lit(c.map(x => x * x).sum)): _*)): _*)
        val seqM = sequence(lit(0), lit(PqM - 1))
        base
          .withColumn("pq_codes", array((0 until PqM).map { mi =>
            nearestCell(slice(col("v"), mi * sub + 1, sub), cb(mi).toIndexedSeq)
          }: _*))
          .withColumn("pq_rnrm", sqrt(aggregate(
            transform(seqM, m => element_at(element_at(cn2Lit, m + 1),
              element_at(col("pq_codes"), m + 1) + 1)),
            lit(0.0), _ + _)))
          .drop("v")
    }
    coded
      .repartition(cents.length, col("cell"))
      .sortWithinPartitions("cell", "vec_id")
      .write.mode(org.apache.spark.sql.SaveMode.Append).partitionBy("cell")
      .option("compression", "zstd")
      .parquet(s"$path/codes")

    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/._INDEX_SUCCESS.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write("appended\n".getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, marker)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"index re-commit rename failed: $tmp -> $marker")
    }
    } finally releaseBuildLock(spark, path, lockTok)
  }

  /** True iff a [[write]] completed — the only state a consumer may read. */
  def committed(spark: SparkSession, path: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_INDEX_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker)
  }

  /** The codebook, cell-ordered — nlist rows, a driver-side read exactly
    * like the inline stages' in-memory centroid literal. */
  def readCentroids(spark: SparkSession, path: String): Seq[Array[Double]] = {
    require(committed(spark, path), s"ANN index at $path is not committed")
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell")
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
      .toSeq
  }

  /** The cell-partitioned coded corpus. Filter on `cell` BEFORE anything
    * else — that predicate is what prunes to the probed directories. */
  def readCodes(spark: SparkSession, path: String): DataFrame = {
    require(committed(spark, path), s"ANN index at $path is not committed")
    spark.read.parquet(s"$path/codes")
  }

  /** The PQ codebooks, (m, k)-ordered — M×K×subdim doubles (~16 KB), a
    * driver-side read like [[readCentroids]]. */
  def readPqCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    require(committed(spark, path), s"ANN index at $path is not committed")
    val rows = spark.read.parquet(s"$path/pq_codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    Array.tabulate(rows.map(_._1).max + 1)(mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3))
  }
}
