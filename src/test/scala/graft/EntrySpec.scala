package graft

/** Driver-contract smoke: flagship entry returns rows; approx-distinct
  * (no-oracle) is bounded against the exact count. */
class EntrySpec extends SparkSpec {

  test("inventory contract: every query has an oracle or a declared no-oracle bound") {
    // queries without DuckDB oracles must be exactly the sketch/trained
    // ops whose unit tests bound them — a new query key missing BOTH an
    // oracle and a place in this set is a silent correctness-gate hole
    // (q_cosine_ivf left this set in round 12: its coarse quantizer is
    // now the integer-exact KMeans training, oracle-checked end to end)
    val noOracleByDesign = Set("q_approx_distinct", "q_approx_percentile")
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ===
      noOracleByDesign)
    // and no oracle without a query (dangling SQL is never exercised)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no oracle rounds per row inside an aggregate (SURVEY 7.4 rule 2)") {
    // round(x, n) BEFORE an oracled sum/avg accumulates engine-divergent
    // ±1-ulp-of-scale rows: Spark rounds the double's shortest decimal
    // repr HALF_UP, DuckDB the binary value, and they split at .xx5
    // boundaries (q_sql_pipe, the round-9 red row: ±$0.45 at sf0.1).
    // The legal shapes are round(sum(...), n) — one round, on the
    // aggregate — and scale-to-integer quantization round(x*100) with
    // NO scale arg (exact-cents inputs sit nowhere near .5). This guard
    // scans the ORACLE texts; the Spark side mirrors them by the
    // column-name contract, so a violation cannot hide on one side.
    // detector: anywhere inside a sum(/avg( argument (ANY depth — a
    // cast() or (a*b) wrapper must not hide it), a round( whose own
    // top-level argument list contains a comma, i.e. round with a scale
    // arg. round(sum(...), n) never matches (the round is OUTSIDE the
    // aggregate) and sum(round(x*100)) never matches (no scale arg =
    // exact integer quantization).
    def perRowScaledRound(sqlRaw: String): Boolean = {
      val s = sqlRaw.toLowerCase(java.util.Locale.ROOT)
      def wordAt(i: Int, w: String): Boolean =
        s.startsWith(w, i) &&
          (i == 0 || !(s(i - 1).isLetterOrDigit || s(i - 1) == '_'))
      // skip whitespace AND comments (/*…*/ nested, -- to end of line):
      // `sum /*c*/ (round(x,2))` must not evade the probe below
      def skipTrivia(from: Int): Int = {
        var j = from
        var moved = true
        while (moved) {
          moved = false
          while (j < s.length && s(j).isWhitespace) { j += 1; moved = true }
          if (s.startsWith("/*", j)) {
            var d = 1; var k = j + 2
            while (k < s.length && d > 0) {
              if (s.startsWith("/*", k)) { d += 1; k += 2 }
              else if (s.startsWith("*/", k)) { d -= 1; k += 2 }
              else k += 1
            }
            j = k; moved = true
          } else if (s.startsWith("--", j)) {
            val nl = s.indexOf('\n', j)
            j = if (nl < 0) s.length else nl + 1
            moved = true
          }
        }
        j
      }
      def roundHasScaleArg(open: Int): Boolean = {
        var j = open + 1; var d = 1
        while (j < s.length && d > 0) {
          s(j) match {
            case '(' => d += 1
            case ')' => d -= 1
            case ',' if d == 1 => return true
            case _ =>
          }
          j += 1
        }
        false
      }
      var i = 0
      while (i < s.length) {
        if ((wordAt(i, "sum") || wordAt(i, "avg")) && {
              val j = skipTrivia(i + 3)
              j < s.length && s(j) == '('
            }) {
          var j = skipTrivia(i + 3) + 1
          var d = 1
          while (j < s.length && d > 0) {
            if (wordAt(j, "round")) {
              val k = skipTrivia(j + 5)
              if (k < s.length && s(k) == '(' && roundHasScaleArg(k))
                return true
            }
            s(j) match { case '(' => d += 1; case ')' => d -= 1; case _ => }
            j += 1
          }
        }
        i += 1
      }
      false
    }
    // selftest: the shapes the round-10 ADVICE showed the old regex
    // missing, plus the two legal shapes
    assert(perRowScaledRound("SELECT sum(round(x, 2)) FROM t"))
    assert(perRowScaledRound("SELECT sum(round(cast(x AS DOUBLE), 2)) FROM t"))
    assert(perRowScaledRound("SELECT sum(round((a*b), 2)) FROM t"))
    assert(perRowScaledRound("SELECT avg(1 + round(coalesce(a, b), 2)) FROM t"))
    assert(!perRowScaledRound("SELECT round(sum(x*(1-d)), 2) FROM t"))
    assert(!perRowScaledRound("SELECT sum(round(x*100)) FROM t"))
    // comments between the name and '(' must not evade the probe
    assert(perRowScaledRound("SELECT sum /*c*/ (round(x, 2)) FROM t"))
    assert(perRowScaledRound("SELECT sum(round/*c*/(x, 2)) FROM t"))
    assert(perRowScaledRound("SELECT sum(round /* a /* b */ c */ (x, 2)) FROM t"))
    assert(perRowScaledRound("SELECT sum(round -- c\n (x, 2)) FROM t"))
    assert(!perRowScaledRound("SELECT round /*c*/ (sum(x), 2) FROM t"))
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if perRowScaledRound(sql) => name
    }
    assert(offenders.isEmpty,
      s"per-row round(x, n) inside an aggregate in oracles: $offenders")
  }

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within 5% of exact per event_type") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.table(spark, sf001, "events")
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("du"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05, s"$k: ${approx(k)} vs $e")
    }
  }

  test("approx_percentile brackets the exact quantiles (no-oracle bound)") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.table(spark, sf001, "lineitem")
    val approx = SparkEntry.queries("q_approx_percentile")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, e) =>
      val (a50, a90, a99) = approx(k)
      // accuracy=10000 → rank error ≤ n/10000; at sf0.001 value error stays
      // well under 2% of the exact quantile for this distribution
      Seq(a50 -> e(0), a90 -> e(1), a99 -> e(2)).foreach { case (a, x) =>
        assert(math.abs(a - x) / x < 0.02, s"$k: approx $a vs exact $x")
      }
    }
  }

  test("q_decimal: money stays decimal-typed in-plan; renderings agree") {
    // the DECLARED outputs are exact integer/string renderings (the
    // compare harness collapses decimal columns to float64) — this test
    // pins what the renderings stand for: the in-plan money math is
    // decimal-typed at the contract scales, and the string rendering is
    // the same number as the cents column
    val df = SparkEntry.queries("q_decimal")(spark, sf001)
    val plan = df.queryExecution.analyzed.toString
    Seq("decimal(12,2)", "decimal(18,4)", "decimal(18,6)").foreach(t =>
      assert(plan.contains(t), s"$t missing from analyzed plan"))
    df.collect().foreach { r =>
      val dec = new java.math.BigDecimal(r.getAs[String]("sum_price_dec"))
      assert(dec.scale == 2, s"rendering not scale-2: $dec")
      assert(dec.movePointRight(2).longValueExact ==
        r.getAs[Long]("sum_price_cents"))
    }
  }

  test("schema evolution: later blocks with new columns merge on read") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graftevo").toString
    // block 1 predates the 'tag' column; block 2 adds it
    spark.range(3).selectExpr("id", "id * 2 AS v").write.parquet(s"$dir/t/b=1")
    spark.range(3).selectExpr("id", "id * 3 AS v", "'x' AS tag").write.parquet(s"$dir/t/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet == Set("id", "v", "tag", "b"))
    // old-block rows surface the new column as null, not an error
    assert(merged.filter(col("b") === 1).select("tag").collect().forall(_.isNullAt(0)))
    assert(merged.count() == 6)
  }

  test("csv and json round-trip with schema inference (ingest pipes)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graftio").toString
    val df = spark.range(5).selectExpr("id", "concat('n', id) AS name", "id * 1.5 AS v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    assert(csv.count() == 5 && json.count() == 5)
    assert(csv.schema("v").dataType.typeName == "double")
    assert(json.schema("id").dataType.typeName == "long")
  }
}
