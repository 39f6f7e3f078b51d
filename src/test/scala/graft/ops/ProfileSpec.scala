package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: one row per column with null/distinct/range stats") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), 20.0), (Some(2L), 30.0), (None, 40.0))
      .toDF("k", "v")
    val p = Profile.numericProfile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(p("k") == ((3L, 1L, 2L, 1.0, 2.0, 1.67)))
    assert(p("v") == ((4L, 0L, 4L, 10.0, 40.0, 25.0)))
  }

  test("numericProfile: empty frame yields zero counts, not nulls") {
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    val p = Profile.numericProfile(df, Seq("k", "v")).collect()
    assert(p.length == 2)
    p.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
  }

  test("qualityChecks: one report row per constraint, violations counted") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), 20.0), (Some(2L), 500.0), (None, -5.0))
      .toDF("k", "v")
    val got = Profile.qualityChecks(df,
        minRows = 10,                       // fails: only 4 rows
        uniqueKeys = Seq("k"),              // fails: k=2 twice (nulls count too)
        notNullCols = Seq("k"),             // fails: one null
        ranges = Map("v" -> (0.0, 100.0)))  // fails: 500.0 and -5.0 outside
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(got("min_rows") == ((4.0, false)))
    assert(got("unique:k") == ((1.0, false))) // 4 rows, 3 distinct key tuples
    assert(got("not_null:k") == ((1.0, false)))
    assert(got("range:v") == ((2.0, false)))
    // an all-green frame passes every gate
    val ok = Profile.qualityChecks(
        Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v"),
        minRows = 1, uniqueKeys = Seq("k"), notNullCols = Seq("k"),
        ranges = Map("v" -> (0.0, 10.0)))
      .collect()
    assert(ok.length == 4 && ok.forall(_.getBoolean(2)))
  }

  test("qualityChecks: single aggregate pass — no joins, one exchange pair") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val plan = Profile.qualityChecks(df, 1, Seq("k"), Seq("v"),
        Map("v" -> (0.0, 10.0)))
      .queryExecution.executedPlan
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"expected a join-free single-pass plan:\n$plan")
  }

  test("sourceScorecard: exact integer means, hand-computed language entropy") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", "en", "x y z", 30L),
      ("a", "en", "x y", 20L),
      ("a", "de", "x", 10L),
      ("b", "fr", "w", 5L)).toDF("source", "lang", "text", "n_chars")
    val out = Profile.sourceScorecard(df, "source", "lang", "text", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // a: n=3, mean_tok=(3+2+1)/3=2, mean_chars=20;
    // H = ln 3 − (2·ln 2 + 1·ln 1)/3  (en:2, de:1)
    val ha = math.log(3.0) - (2 * math.log(2.0)) / 3
    assert(out("a") == ((3L, 2.0, 20.0, math.rint(ha * 1e6) / 1e6)))
    // single-doc source: entropy exactly 0
    assert(out("b") == ((1L, 1.0, 5.0, 0.0)))
  }

  test("skewProfile: skew factor, exact p99, heaviest-first top keys") {
    // key "hot" 90 rows, "warm" 8, "a"/"b" 1 each: mean 25, skew 3.6
    val rows = Seq.fill(90)("hot") ++ Seq.fill(8)("warm") ++ Seq("a", "b")
    val df = rows.toDF("k2")
    val r = Profile.skewProfile(df, "k2", topN = 3).head()
    assert(r.getAs[Long]("n_keys") == 4 && r.getAs[Long]("n_rows") == 100)
    assert(r.getAs[Long]("max_cnt") == 90)
    assert(r.getAs[Double]("mean_cnt") == 25.0)
    assert(r.getAs[Double]("skew_factor") == 3.6)
    // counts sorted: 1,1,8,90 → p99 at pos 0.99*3 = 2.97 → 8 + 0.97*82
    // (compared at the op's 6dp rounding, not raw float arithmetic)
    assert(r.getAs[Double]("p99_cnt") == 87.54)
    assert(r.getAs[String]("top_keys") == "hot:90;warm:8;a:1")
  }

  test("tableFingerprint: invariant to row order, sensitive to content") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "x", "g"), (2L, "y", "g"), (3L, "z", "h"))
      .toDF("k", "s", "grp")
    val shuffled = Seq((3L, "z", "h"), (2L, "y", "g"), (1L, "x", "g"))
      .toDF("k", "s", "grp")
    def fps(df: org.apache.spark.sql.DataFrame) =
      Profile.tableFingerprint(df.repartition(7), Seq("k", "s"), Seq("grp"))
        .orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fps(a) == fps(shuffled))
    val edited = Seq((1L, "x", "g"), (2L, "Y", "g"), (3L, "z", "h"))
      .toDF("k", "s", "grp")
    val byGrp = fps(edited).map(t => t._1 -> t._3).toMap
    val orig = fps(a).map(t => t._1 -> t._3).toMap
    assert(byGrp("g") != orig("g") && byGrp("h") == orig("h"))
  }

  test("tableFingerprint: null placement is not ambiguous (explicit null marker)") {
    val ab = Seq((Some("a"), None: Option[String])).toDF("x", "y")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
    val ba = Seq((None: Option[String], Some("a"))).toDF("x", "y")
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.tableFingerprint(df, Seq("x", "y"), Seq("grp"))
        .head().getLong(2)
    // concat_ws alone would DROP the nulls and collide these two rows
    assert(fp(ab) != fp(ba))
  }

  test("merkleTree: consistent tree — root counts everything, parents fold children") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "s")
    val nodes = Profile.merkleTree(df, Seq("k", "s"), col("k"), levels = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(nodes.size == 31) // 16 + 8 + 4 + 2 + 1
    assert(nodes((0, 0L))._1 == 200L)
    // leaves are 64-hex limb concatenations, parents full 32-hex md5
    assert(nodes((4, 0L))._2.length == 64)
    for (lv <- 0 until 4; i <- 0 until (1 << lv)) {
      val (n, d) = nodes((lv, i.toLong))
      val (ln, ld) = nodes((lv + 1, 2L * i))
      val (rn, rd) = nodes((lv + 1, 2L * i + 1))
      assert(n == ln + rn)
      assert(d == Hashing.md5Hex(s"$ld|$rd") && d.length == 32)
    }
  }

  test("merkleTree: partition-order invariant; one edited row changes exactly its root path") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 300L).map(i => (i, s"v$i"))
    val a = Profile.merkleTree(rows.toDF("k", "s"), Seq("k", "s"),
      col("k"), levels = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    val b = Profile.merkleTree(rows.reverse.toDF("k", "s").repartition(7),
      Seq("k", "s"), col("k"), levels = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(a == b, "digest depends on row/partition order")
    // edit one row's content: exactly one leaf differs, and each level
    // above differs in exactly one node (the root path) — the property
    // that makes version diff logarithmic
    val edited = rows.map { case (k, s) => (k, if (k == 137L) "X" else s) }
    val c = Profile.merkleTree(edited.toDF("k", "s"), Seq("k", "s"),
      col("k"), levels = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    for (lv <- 0 to 5) {
      val diff = (0 until (1 << lv)).count(i => a((lv, i.toLong)) != c((lv, i.toLong)))
      assert(diff == 1, s"level $lv: $diff nodes differ, want 1")
    }
  }

  test("merkleTree: null keys bucket under the sentinel instead of NPE-ing") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("k", "s")
    val root = Profile.merkleTree(df, Seq("k", "s"), col("k"), levels = 3)
      .collect().find(r => r.getInt(0) == 0).get
    assert(root.getLong(2) == 3L, "null-key rows must still count")
    // and the null bucket is the chr(1)-sentinel bucket: hashing an
    // explicit sentinel key lands the same rows in the same leaf
    val explicitSentinel = Seq(("\u0001", "b"), ("\u0001", "c"))
      .toDF("k", "s")
    val viaNull = Profile.merkleTree(
      Seq((Option.empty[Long], "b"), (Option.empty[Long], "c"))
        .toDF("k", "s"),
      Seq("s"), col("k"), levels = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    val viaSentinel = Profile.merkleTree(explicitSentinel,
      Seq("s"), col("k"), levels = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(viaNull == viaSentinel)
  }

  test("merkleApplyDeltas: CDC deltas (update+insert+delete) reproduce the rebuild; a tampered delta flips the root") {
    import org.apache.spark.sql.functions.col
    val cols = Seq("k", "s")
    val base = (1L to 300L).map(i => (i, s"v$i")).toDF("k", "s")
    // update every mod-7 row, delete every mod-11 (non-mod-7) row,
    // insert 10 fresh keys — the three CDC verbs in one feed
    val updatedRows = (1L to 300L).filter(_ % 7 == 0).map(i => (i, s"w$i"))
    val deletedRows = (1L to 300L).filter(i => i % 11 == 0 && i % 7 != 0)
    val insertedRows = (1001L to 1010L).map(i => (i, s"v$i"))
    val finalRows = (1L to 300L)
      .filterNot(i => i % 11 == 0 && i % 7 != 0)
      .map(i => (i, if (i % 7 == 0) s"w$i" else s"v$i")) ++ insertedRows
    val deleted = base.filter(col("k") % 7 === 0 ||
      col("k") % 11 === 0)
    val inserted = updatedRows.toDF("k", "s")
      .unionByName(insertedRows.toDF("k", "s"))
    val deltas = Profile.merkleLeafDeltas(deleted, inserted, cols,
      col("k"), levels = 5)
    def nodes(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val incr = nodes(Profile.merkleApplyDeltas(
      Profile.merkleLeaves(base, cols, col("k"), 5), deltas, 5))
    val rebuilt = nodes(Profile.merkleTree(finalRows.toDF("k", "s"), cols,
      col("k"), 5))
    assert(incr == rebuilt, "incremental != full rebuild")
    // tamper: shift one limb of one leaf delta by 1 — the root digest
    // must move (the corruption-evidence property the tree exists for)
    val tampered = deltas.withColumn("dl0",
      org.apache.spark.sql.functions.when(col("idx") === deltas.select("idx").head().getLong(0),
        col("dl0") + 1L).otherwise(col("dl0")))
    val badRoot = nodes(Profile.merkleApplyDeltas(
      Profile.merkleLeaves(base, cols, col("k"), 5), tampered, 5))((0, 0L))._2
    assert(badRoot != rebuilt((0, 0L))._2, "tampering went undetected")
  }

  test("merkle additive fold: duplicate-pair append CHANGES the digest (the XOR-cancellation regression)") {
    import org.apache.spark.sql.functions.col
    // the pre-round-10 60-bit XOR leaf fold cancelled on any even
    // multiset of equal row hashes: appending the same row twice left
    // every digest untouched. The additive limb fold must not.
    val rows = (1L to 100L).map(i => (i, s"v$i"))
    val dup = rows ++ Seq((7L, "v7"), (7L, "v7"))
    def tree(rs: Seq[(Long, String)]) =
      Profile.merkleTree(rs.toDF("k", "s"), Seq("k", "s"), col("k"), 4)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    val a = tree(rows)
    val b = tree(dup)
    assert(a((0, 0L)) != b((0, 0L)),
      "even-multiset append cancelled — XOR regression")
    // and the limb arithmetic is why: the leaf digest moves by exactly
    // 2× the row's limbs mod 2^32
    val leaf = (Hashing.longHash60("7") % 16).toInt
    val limbsBefore = a((4, leaf.toLong)).grouped(8)
      .map(java.lang.Long.parseLong(_, 16)).toArray
    val limbsAfter = b((4, leaf.toLong)).grouped(8)
      .map(java.lang.Long.parseLong(_, 16)).toArray
    val rowLimbs = Hashing.sha256Limbs("7\u001fv7")
    (0 until 8).foreach { j =>
      assert(limbsAfter(j) ==
        java.lang.Math.floorMod(limbsBefore(j) + 2 * rowLimbs(j), 1L << 32))
    }
  }
}
