package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One B×B TILE of the integer Gram matrix — the column-block-partitioned
  * outer product that carries covariance/PC1 past the dimensionality where
  * [[GramAgg]]'s monolithic buffer stops being a sane per-task allocation.
  *
  * Why this exists: GramAgg folds each partition into ONE (2+dim+dim²)-long
  * array — measured-optimal at the testdata's dim 64, but dim² longs per
  * map task is ~128 MB at dim 4096, and a 32-task executor would hold
  * ~4 GB of Gram buffers before the first merge. Since the FULL dim×dim
  * matrix is what the driver ultimately needs, the only way to shrink
  * per-task state without giving up the one-pass read is to key the
  * aggregation by (block-row, block-col) TILE: each corpus row explodes
  * into its O((dim/B)²) upper-triangle block pairs (bi ≤ bj — the mirror
  * is assembled driver-side), and each tile key aggregates one
  * (3 + |bi| + |bj| + |bi|·|bj|)-long buffer.
  *
  * Scale shape: the explode inflates rows IN-STAGE only — Spark's
  * ObjectHashAggregate does map-side partial aggregation before the
  * exchange, and once the hash map passes the sort-fallback threshold
  * (spark.sql.objectHashAggregate.sortBased.fallbackThreshold, default
  * 128 keys) it degrades to SORT-based partial aggregation: resident
  * state is then O(threshold · B²) longs with the exploded rows spilling
  * through the sorter, never O(dim²) resident. The shuffle carries at
  * most (dim/B)²/2 tiles per map task (streamed, not resident), and the
  * reduce side holds only the tiles it owns. At B = 128, dim = 4096:
  * 528 tiles of ~131 KB each, ~17 MB resident per task at the default
  * threshold — versus GramAgg's 128 MB monolith.
  *
  * Buffer layout (flat long array): [li, lj, n, si(1..li), sj(1..lj),
  * p(1..li·lj) row-major]. The zero buffer is the 3-element [0,0,0]
  * until the first row fixes the block lengths (edge blocks of a
  * dim % B ≠ 0 corpus are shorter — lengths are per-tile constants).
  * The diagonal tiles (bi = bj) carry the per-coordinate sums and n the
  * driver needs; off-diagonal si/sj are redundant but keep the merge
  * branch-free (B extra longs against B² is noise).
  *
  * Overflow discipline: addExact/multiplyExact — identical to [[GramAgg]]
  * (loud failure where a DuckDB BIGINT oracle errors, never a wrap).
  * Ragged corpora are rejected by name at the first offending row.
  *
  * Diagonal halving (round 14): the third input flags a DIAGONAL tile
  * (bi = bj, so the two slices are the same block and the product
  * sub-matrix is symmetric) — reduce then fills only the upper triangle
  * (j ≥ i), halving the multiply/add work on the diagonal stripe; the
  * lower cells stay 0 in the buffer and the driver assembles them by
  * mirror (which it did for the cross-block half already). The flag is
  * a function of the TILE KEY, so every row and merge partner of one
  * tile agrees on it — mixed fills within a tile cannot occur. */
class GramTileAgg
    extends Aggregator[(Seq[Long], Seq[Long], Boolean), Array[Long],
      Array[Long]] {

  override def zero: Array[Long] = Array(0L, 0L, 0L)

  override def reduce(buf0: Array[Long], v: (Seq[Long], Seq[Long], Boolean))
      : Array[Long] = {
    val a = v._1.toArray
    val b = v._2.toArray
    val diag = v._3
    val li = a.length
    val lj = b.length
    require(!diag || li == lj,
      s"gram tile: diagonal tile with unequal block lengths ($li,$lj) — " +
        "the diag flag must only be set for bi = bj")
    require(li > 0 && lj > 0,
      "gram tile: empty block slice — ragged corpus (a row shorter than " +
        "the probed dimension leaves a trailing block empty)")
    val buf =
      if (buf0.length == 3) {
        val init = new Array[Long](3 + li + lj + li * lj)
        init(0) = li
        init(1) = lj
        init
      } else buf0
    require(buf(0) == li && buf(1) == lj,
      s"gram tile: ragged corpus — row has block ($li,$lj), tile has " +
        s"(${buf(0)},${buf(1)}) (all embedding rows must share one dimension)")
    buf(2) = Math.addExact(buf(2), 1L)
    var i = 0
    while (i < li) {
      buf(3 + i) = Math.addExact(buf(3 + i), a(i))
      i += 1
    }
    var j = 0
    while (j < lj) {
      buf(3 + li + j) = Math.addExact(buf(3 + li + j), b(j))
      j += 1
    }
    i = 0
    while (i < li) {
      val row = 3 + li + lj + i * lj
      val ai = a(i)
      j = if (diag) i else 0 // diagonal tile: upper triangle only
      while (j < lj) {
        buf(row + j) = Math.addExact(buf(row + j), Math.multiplyExact(ai, b(j)))
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 3) b
    else if (b.length == 3) a
    else {
      require(a(0) == b(0) && a(1) == b(1),
        s"gram tile: merging (${a(0)},${a(1)}) with (${b(0)},${b(1)}) — " +
          "ragged corpus")
      var i = 2 // cells 0,1 are the block lengths, equal on both sides
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
