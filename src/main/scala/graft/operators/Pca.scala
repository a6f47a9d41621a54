package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant principal direction of an embedding corpus by POWER ITERATION
  * (von Mises 1929) over the exact integer covariance — the "all-but-the-
  * top" post-processing shape (Mu & Viswanath, ICLR 2018: embedding sets
  * share a large common direction; subtracting it improves downstream
  * similarity), built so an iterative LINEAR-ALGEBRA algorithm carries a
  * bit-exact cross-engine oracle like q_kmeans/q_pagerank:
  *
  *   - vectors quantize once to integer grid points (the [[KMeans]]
  *     contract: floor(x·scale + 0.5) on the double-widened value);
  *   - the centered Gram matrix stays integer by cross-multiplication:
  *     n²·cov[i][j] ∝ n·Σ(vᵢvⱼ) − (Σvᵢ)(Σvⱼ), each term an exact integer
  *     sum, then one floor division by n² bounds cell magnitude;
  *   - each power round is an integer matvec followed by fixed-point
  *     renormalization v′ = (G·v)·scale DIV max|G·v| — every operation
  *     truncation-exact in both engines (BigInt `/` ≡ Long `/` ≡ DuckDB
  *     `//`, truncation toward zero).
  *
  * Scale shape: the corpus is touched by exactly ONE aggregate — a
  * mergeable per-partition outer-product fold ([[graft.functions.GramAgg]])
  * whose shuffle carries one (2 + dim + dim²)-long buffer per map task,
  * never a re-keyed corpus row — and the dim×dim matrix is bounded driver
  * state (the Ivf/KMeans trained-artifact pattern), so the power rounds
  * cost ZERO cluster work. 100 TB = one aggregation pass, full stop.
  * (`gramViaJoin = true` keeps the previous formulation — posexplode +
  * id self-join + dim²-cell aggregate — as the small-dim fallback; it
  * shuffles dim × n rows both sides and is only competitive when dim² state
  * per task would dwarf the partition, i.e. dim in the several-thousands
  * with tiny partitions. PcaSpec pins both paths bit-identical.)
  *
  * Overflow discipline: corpus sums accumulate with addExact/multiplyExact
  * (loud failure exactly where a DuckDB BIGINT oracle errors, never a
  * silent wrap); everything DRIVER-side — covariance cells, matvec,
  * renorm — runs in BigInt, so no magnitude cap is needed at any dim or
  * scale (the production-scale arithmetic the round-11 cell bound asked
  * for; cost is dim² BigInt ops per round on the driver, microseconds). */
object Pca {

  /** The dominant direction after `iters` power rounds, as one row per
    * coordinate: (i, x) with i 1-BASED (matching SQL subscripts) and x
    * the fixed-point component in [−scale, scale] (renormalized by the
    * max-abs coordinate each round; start vector = scale·e₁).
    *
    * Gram-pass selection (all three bit-identical — PcaSpec pins it):
    * default = [[graft.functions.GramAgg]], one (2+dim+dim²)-long buffer
    * per map task — optimal while dim² longs is a sane task allocation
    * (dim ≲ 512–1k); `gramBlock = B > 0` = the column-block TILED outer
    * product ([[graft.functions.GramTileAgg]]), per-task resident state
    * O(B²) — the production path at dim ≥ 1k where the monolithic buffer
    * is ~dim²·8 bytes/task (128 MB at dim 4096); `gramViaJoin` = the
    * posexplode/self-join fallback kept as the pure-built-in reference. */
  def dominantDirection(emb: DataFrame, idCol: String, embCol: String,
      iters: Int, scale: Int = 1000,
      gramViaJoin: Boolean = false, gramBlock: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(!(gramViaJoin && gramBlock > 0),
      "choose ONE gram path: gramViaJoin or gramBlock, not both")
    val spark = emb.sparkSession
    val (n, sums, prods) =
      if (gramViaJoin) gramByJoin(emb, idCol, embCol, scale)
      else if (gramBlock > 0) gramByTiles(emb, embCol, scale, gramBlock)
      else gramByAgg(emb, embCol, scale)
    require(n > 0, "dominantDirection: empty corpus")
    val dim = sums.keys.maxOption.getOrElse(0)
    // covariance cross-multiplied to integers, bounded by DIV n²; BigInt
    // end to end (the intermediate n·pp − sᵢ·sⱼ can exceed int64 even
    // when each term fits), truncation toward zero everywhere
    val g = Array.tabulate(dim, dim) { (i0, j0) =>
      val (i, j) = (i0 + 1, j0 + 1)
      val pp = prods.getOrElse((i, j), throw new IllegalArgumentException(
        s"dominantDirection: no (i,j)=($i,$j) product sum — ragged " +
          "corpus? all embedding rows must share one dimension"))
      (BigInt(n) * pp - BigInt(sums(i)) * sums(j)) / (BigInt(n) * n)
    }
    var v = Array.tabulate(dim)(i =>
      if (i == 0) BigInt(scale) else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      require(m > 0, "dominantDirection: G·v vanished — degenerate " +
        "covariance (all-constant coordinates?)")
      v = w.map(x => x * scale / m) // fixed-point renorm, trunc toward 0
    }
    spark.createDataFrame(v.toSeq.zipWithIndex
        // in [−scale, scale] by the renorm — always Long-safe
        .map { case (x, i0) => (i0 + 1, x.toLong) })
      .toDF("i", "x")
  }

  /** One-pass Gram: the corpus folds into per-partition
    * (n, Σvᵢ, Σvᵢvⱼ) buffers, merged by elementwise exact addition —
    * no explode, no join, no corpus re-key (see [[graft.functions.GramAgg]]). */
  private def gramByAgg(emb: DataFrame, embCol: String, scale: Int)
      : (Long, Map[Int, Long], Map[(Int, Int), Long]) = {
    val buf = gramFrame(emb, embCol, scale).collect().head.getSeq[Long](0)
    if (buf(0) == 0L) (0L, Map.empty, Map.empty)
    else {
      val dim = buf(0).toInt
      val n = buf(1)
      val sums = (1 to dim).map(i => i -> buf(1 + i)).toMap
      val prods = (for (i <- 1 to dim; j <- 1 to dim)
        yield (i, j) -> buf(1 + dim + (i - 1) * dim + j)).toMap
      (n, sums, prods)
    }
  }

  /** The 1-row gram-buffer frame the agg path collects — exposed so
    * PlanSpec can pin its physical shape (no Generate, no Join, no
    * corpus re-key; the only exchange carries one buffer per task). */
  private[graft] def gramFrame(emb: DataFrame, embCol: String,
      scale: Int): DataFrame = {
    val gram = udaf(new graft.functions.GramAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    emb.select(KMeans.quantize(col(embCol), scale).as("q"))
      .agg(gram(col("q")).as("g"))
  }

  /** Column-block TILED Gram ([[graft.functions.GramTileAgg]]): each row
    * explodes into its (dim/B)(dim/B+1)/2 upper-triangle block pairs and
    * the aggregation is keyed by tile — per-task resident state drops
    * from dim² to O(B²) (sort-based partial-agg fallback past the
    * object-hash threshold), the corpus is still read exactly ONCE, and
    * the shuffle carries tiles, not corpus rows. The mirror half and the
    * per-coordinate sums (diagonal tiles) are assembled driver-side. */
  private def gramByTiles(emb: DataFrame, embCol: String, scale: Int,
      block: Int): (Long, Map[Int, Long], Map[(Int, Int), Long]) = {
    require(block >= 1, s"gramBlock must be >= 1 (got $block)")
    val rows = gramTileFrame(emb, embCol, scale, block).collect()
    if (rows.isEmpty) (0L, Map.empty, Map.empty)
    else {
      var n = 0L
      val sums = Map.newBuilder[Int, Long]
      val prods = Map.newBuilder[(Int, Int), Long]
      rows.foreach { r =>
        val bi = r.getInt(0)
        val bj = r.getInt(1)
        val tile = r.getSeq[Long](2)
        val li = tile(0).toInt
        val lj = tile(1).toInt
        if (bi == bj) {
          n = tile(2)
          var i = 0
          while (i < li) { sums += (bi * block + i + 1) -> tile(3 + i); i += 1 }
        }
        var i = 0
        while (i < li) {
          var j = 0
          while (j < lj) {
            val p = tile(3 + li + lj + i * lj + j)
            val gi = bi * block + i + 1
            val gj = bj * block + j + 1
            prods += (gi, gj) -> p
            prods += (gj, gi) -> p // the mirrored lower-triangle half
            j += 1
          }
          i += 1
        }
      }
      (n, sums.result(), prods.result())
    }
  }

  /** The tile frame the blocked path collects — exposed so PcaSpec can
    * pin its physical shape (one aggregation exchange keyed by tile; the
    * explode feeds the partial agg in-stage and never shuffles raw
    * block rows). One row per upper-triangle tile. */
  private[graft] def gramTileFrame(emb: DataFrame, embCol: String,
      scale: Int, block: Int): DataFrame = {
    // dim from one row: bounded driver state, the trained-artifact
    // pattern (a LIMIT-1 scan, not a full pass)
    val head = emb.select(size(col(embCol)).as("d")).limit(1).collect()
    if (head.isEmpty)
      return emb.sparkSession.emptyDataFrame
        .select(lit(0).as("bi"), lit(0).as("bj"),
          lit(null).cast("array<bigint>").as("tile"))
    val dim = head.head.getInt(0)
    val nb = (dim + block - 1) / block
    val tileAgg = udaf(new graft.functions.GramTileAgg,
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Seq[Long], Seq[Long])]())
    // ragged guard IN-PLAN: the tiles only see SLICES, so a row LONGER
    // than the probed dim would otherwise truncate silently (its excess
    // coordinates fall outside every block) and a shorter row surfaces
    // as a confusing empty-slice error — name the contract violation at
    // the row instead (the GramAgg convention)
    val q = emb.select(KMeans.quantize(col(embCol), scale).as("q"))
      .filter(assert_true(size(col("q")) === dim,
        concat(lit("gram tile: ragged corpus — row has dim "),
          size(col("q")),
          lit(s", corpus has dim $dim (all embedding rows must share " +
            "one dimension)"))).isNull)
    val pairs = for { bi <- 0 until nb; bj <- bi until nb } yield
      struct(lit(bi).as("bi"), lit(bj).as("bj"),
        slice(col("q"), bi * block + 1, block).as("qi"),
        slice(col("q"), bj * block + 1, block).as("qj"))
    q.select(explode(array(pairs: _*)).as("t"))
      .groupBy(col("t.bi").as("bi"), col("t.bj").as("bj"))
      .agg(tileAgg(col("t.qi"), col("t.qj")).as("tile"))
  }

  /** The join-form Gram (posexplode → id self-join → dim²-cell agg):
    * shuffles dim × n rows both sides; kept as the explicit fallback for
    * regimes where dim² per-task state is the binding constraint. */
  private def gramByJoin(emb: DataFrame, idCol: String, embCol: String,
      scale: Int): (Long, Map[Int, Long], Map[(Int, Int), Long]) = {
    val q = emb.select(col(idCol).cast("long").as("id"),
        posexplode(KMeans.quantize(col(embCol), scale)).as(Seq("p", "v")))
      .select(col("id"), (col("p") + 1).cast("int").as("i"), col("v"))
    val sums = q.groupBy("i").agg(sum("v").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prods = q.as("a").join(q.as("b"), "id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("pp"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    (emb.count(), sums, prods)
  }
}
