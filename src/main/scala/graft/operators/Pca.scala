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
  *     n²·cov[i][j] ∝ n·Σ(vᵢvⱼ) − (Σvᵢ)(Σvⱼ), each term an exact BIGINT
  *     sum, then one floor division by n² bounds cell magnitude;
  *   - each power round is an integer matvec followed by fixed-point
  *     renormalization v′ = (G·v)·scale DIV max|G·v| — every operation
  *     truncation-exact in both engines (Spark/Java `/` ≡ DuckDB `//`).
  *
  * Scale shape: the corpus is touched by exactly TWO aggregates — the
  * per-coordinate sums and the (i,j) product sums (one equi-join on id,
  * word-count shuffle of dim² cells with map-side partials; at very
  * large dim prefer per-partition outer-product accumulation, at dim 64
  * the join form is optimal) — and the dim×dim matrix is bounded driver
  * state (the Ivf/KMeans trained-artifact pattern), so the power rounds
  * cost ZERO cluster work. 100 TB = two aggregation passes, full stop. */
object Pca {

  /** The dominant direction after `iters` power rounds, as one row per
    * coordinate: (i, x) with i 1-BASED (matching SQL subscripts) and x
    * the fixed-point component in [−scale, scale] (renormalized by the
    * max-abs coordinate each round; start vector = scale·e₁). */
  def dominantDirection(emb: DataFrame, idCol: String, embCol: String,
      iters: Int, scale: Int = 1000): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    val spark = emb.sparkSession
    val q = emb.select(col(idCol).cast("long").as("id"),
        posexplode(KMeans.quantize(col(embCol), scale)).as(Seq("p", "v")))
      .select(col("id"), (col("p") + 1).cast("int").as("i"), col("v"))
    // two corpus aggregates; everything after is bounded driver state
    val sums = q.groupBy("i").agg(sum("v").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prods = q.as("a").join(q.as("b"), "id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.v") * col("b.v")).as("pp"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val dim = sums.keys.max
    val n = emb.count()
    require(n > 0, "dominantDirection: empty corpus")
    val g = Array.tabulate(dim, dim) { (i0, j0) =>
      val (i, j) = (i0 + 1, j0 + 1)
      // covariance cross-multiplied to integers, bounded by DIV n².
      // The intermediate n·pp − sᵢ·sⱼ can exceed Long near its own
      // bound (each term alone ≤ n²·scale² but their difference is not)
      // — compute in BigInt; the DIVIDED cell is ~scale²-sized and must
      // fit, which the require pins loudly. BigInt `/` truncates toward
      // zero like Long `/` and DuckDB `//`, so the oracle (whose BIGINT
      // arithmetic errors loudly on overflow rather than wrapping)
      // computes the identical cell wherever it computes at all.
      val cell = (BigInt(n) * prods((i, j)) - BigInt(sums(i)) * sums(j)) /
        (BigInt(n) * n)
      // bound each cell so the matvec AND its renorm can never overflow
      // Long: |w_i| ≤ dim·|cell|·scale and the renorm multiplies by
      // scale again — the engine must fail loudly here exactly where
      // the oracle's DuckDB BIGINT arithmetic would error, never wrap
      val cellBound = Long.MaxValue / (dim.toLong * scale * scale * 2)
      require(cell.abs <= cellBound,
        s"dominantDirection: covariance cell ($i,$j) = $cell exceeds the " +
          s"overflow-safe bound $cellBound — lower the quantization " +
          s"scale (got $scale)")
      cell.toLong
    }
    var v = Array.tabulate(dim)(i => if (i == 0) scale.toLong else 0L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      require(m > 0, "dominantDirection: G·v vanished — degenerate " +
        "covariance (all-constant coordinates?)")
      v = w.map(x => x * scale / m) // fixed-point renorm, trunc toward 0
    }
    spark.createDataFrame(v.toSeq.zipWithIndex
        .map { case (x, i0) => (i0 + 1, x) })
      .toDF("i", "x")
  }
}
