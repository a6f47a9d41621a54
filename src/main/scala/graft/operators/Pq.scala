package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product-quantization-style embedding compression (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split a dim-D vector into `m` subspaces of `subDim`
  * dims and store ONE small integer code per subspace. Here each
  * subspace's codebook is the FIXED sign-orthant grid — code bit `i`
  * is set iff dimension `j·subDim + i` is positive — the same
  * untrained-but-deterministic choice as `Ivf.fixedCellOf`, which is
  * what keeps the operator bit-portable to a DuckDB oracle (a
  * Lloyd-trained codebook would be engine-private float state like
  * `q_cosine_ivf`).
  *
  * Compression: a 64-dim float vector (256 bytes) becomes 8 byte-wide
  * codes — 32× smaller. At 100 TB that is THE point: the code table
  * (built once at ingest, like the LSH band index) is what scans and
  * shuffles; full vectors are fetched only for the final shortlist
  * re-rank, an id-equi-join whose probe side is `shortlist` rows.
  *
  * Distance: symmetric PQ distance between two code arrays is the sum
  * over subspaces of a k×k lookup table; for the sign codebook that
  * table is exactly `bit_count(a XOR b)`, so the scan side is two
  * codegen'd integer ops per subspace — no floats touched until the
  * re-rank. Because the `m·subDim` bits tile every dimension, the
  * summed code Hamming equals the per-dimension sign-disagreement
  * count, which is how the DuckDB oracle cross-checks it from the raw
  * floats without ever materializing codes.
  */
object Pq {

  /** Encode `embCol` (array<float>, dim ≥ m·subDim) as `m` sign-orthant
    * codes, one int per subspace (bit i ⇔ dim j·subDim+i > 0). */
  def encode(embCol: String, m: Int, subDim: Int): Column =
    expr(
      s"transform(sequence(0, ${m - 1}), j -> " +
        s"aggregate(sequence(0, ${subDim - 1}), 0, (acc, i) -> " +
        s"acc + IF(element_at($embCol, j * $subDim + i + 1) > 0D, shiftleft(1, i), 0)))")

  /** Summed per-subspace code distance Σ_j bit_count(a_j XOR b_j) —
    * integer-only, stays inside whole-stage codegen. */
  def codeDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h)

  /** ANN top-`k` for the corpus row `queryId`: rank every other row by
    * PQ code distance (ties → smaller id), keep the best `shortlist`,
    * then re-rank that shortlist by EXACT cosine over the full vectors
    * (ties → smaller id). Returns (idCol, ham, cos).
    *
    * Scale shape: stage 1 scans only the code table against the
    * broadcast query codes (narrow, integer codegen, one TakeOrdered);
    * stage 2 joins the `shortlist`-row result back to the corpus on id
    * (AQE broadcasts the tiny side), so full vectors are read for
    * `shortlist` rows, not the corpus. */
  def searchPq(emb: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int, m: Int = 8, subDim: Int = 8,
      shortlist: Int = 50): DataFrame = {
    val codes = emb.select(col(idCol), encode(embCol, m, subDim).as("code"))
    val q = emb.filter(col(idCol) === queryId)
      .select(encode(embCol, m, subDim).as("qcode"), col(embCol).as("qe"))
    val sl = codes.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q.select(col("qcode"))))
      .select(col(idCol),
        codeDistance(col("code"), col("qcode")).cast("long").as("ham"))
      .orderBy(col("ham"), col(idCol))
      .limit(shortlist)
    sl.join(emb.select(col(idCol), col(embCol)), Seq(idCol))
      .crossJoin(broadcast(q.select(col("qe"))))
      .select(col(idCol), col("ham"),
        round(VectorFunctions.dotProduct(col(embCol), col("qe")) /
          (sqrt(VectorFunctions.norm2(col(embCol))) *
            sqrt(VectorFunctions.norm2(col("qe")))), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
