package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling — the schema-sanity pass a large-scale pipeline runs
  * before training ingest (null rates, cardinalities, value ranges).
  *
  * Single scan: every statistic for every column is computed in ONE
  * aggregate (the exact distinct counts rewrite into a Catalyst Expand —
  * one extra pass per distinct column but still a single stage pipeline),
  * then the one result row is exploded into one output row per column.
  * No per-column jobs, no driver-side loops — at 100 TB this is one pass
  * over the data. Swap `count_distinct` for `approx_count_distinct` when
  * exactness isn't required and the Expand triples the scan cost.
  */
object Profile {

  /** Per-column stats for numeric columns: non-null count, null count,
    * exact distinct count, min/max (6dp) and mean (2dp — double sums are
    * order-dependent across partitions, so the mean is only comparable
    * after coarse rounding; min/max are exact). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        // sum over zero rows is NULL; a count must read 0 on an empty table
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__ndist"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        round(avg(col(c)), 2).as(s"${c}__avg"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n_non_null"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__avg").as("avg_v"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*")
  }

  /** Data-quality expectation gate (the deequ / great-expectations
    * shape): declarative constraints evaluated in ONE aggregate pass,
    * reported as one row per check — `(check, value, pass)` — so a
    * pipeline can fail fast on `pass = false` before an expensive
    * training ingest.
    *
    * Checks: `min_rows` (row count ≥ threshold); `unique:<keys>`
    * (no duplicate key tuples — value = duplicate count);
    * `not_null:<col>` per column (value = null count); `range:<col>`
    * per bounded column (value = count of rows outside [lo, hi];
    * nulls don't violate range — list the column under `notNullCols`
    * too if they should fail).
    *
    * Scale shape: everything folds into a single hash-aggregate over one
    * scan (the uniqueness check adds one count_distinct Expand), exactly
    * like [[numericProfile]] — no per-check jobs, no driver loops. */
  def qualityChecks(
      df: DataFrame,
      minRows: Long,
      uniqueKeys: Seq[String],
      notNullCols: Seq[String],
      ranges: Map[String, (Double, Double)]): DataFrame = {
    val nullAggs = notNullCols.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__nn_$c"))
    val rangeAggs = ranges.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
      coalesce(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)), lit(0L))
        .as(s"__rg_$c")
    }
    val uniqueAggs =
      if (uniqueKeys.isEmpty) Nil
      else Seq(count_distinct(struct(uniqueKeys.map(col): _*)).as("__ndist"))
    val aggs = Seq(count(lit(1)).as("__n")) ++ uniqueAggs ++ nullAggs ++ rangeAggs
    val one = df.agg(aggs.head, aggs.tail: _*)
    // "chk", not "check": CHECK is a reserved word downstream (DuckDB)
    val checks =
      Seq(struct(lit("min_rows").as("chk"),
        col("__n").cast("double").as("value"),
        (col("__n") >= minRows).as("pass"))) ++
      (if (uniqueKeys.isEmpty) Nil
       else Seq(struct(lit(s"unique:${uniqueKeys.mkString(",")}").as("chk"),
         (col("__n") - col("__ndist")).cast("double").as("value"),
         (col("__n") === col("__ndist")).as("pass")))) ++
      notNullCols.map(c =>
        struct(lit(s"not_null:$c").as("chk"),
          col(s"__nn_$c").cast("double").as("value"),
          (col(s"__nn_$c") === 0).as("pass"))) ++
      ranges.toSeq.sortBy(_._1).map { case (c, _) =>
        struct(lit(s"range:$c").as("chk"),
          col(s"__rg_$c").cast("double").as("value"),
          (col(s"__rg_$c") === 0).as("pass"))
      }
    one.select(explode(array(checks: _*)).as("p")).select("p.*")
  }

  /** Per-source corpus scorecard — the "feed quality" report a mixing
    * decision reads: document count, mean token/char length, and language
    * entropy (H = ln n − (Σ c·ln c)/n over the per-language counts).
    *
    * Engine parity: means divide exact integer sums; the entropy Σ is
    * folded over the per-language terms in LANGUAGE-SORTED order (a
    * ≤|langs|-element array fold, not a float aggregation across
    * partitions), so the result is deterministic and bit-identical in
    * both engines — the order-dependent double-sum trap numericProfile's
    * mean dodges with coarse rounding is structurally absent here.
    *
    * Scale shape: ONE scan → (source, lang) hash-agg with map-side
    * combine → per-source re-agg; the fold sees ≤|langs| elements per
    * source. */
  def sourceScorecard(
      df: DataFrame,
      srcCol: String,
      langCol: String,
      textCol: String,
      charsCol: String): DataFrame = {
    val base = df.select(col(srcCol), col(langCol),
      size(TextAnalysis.words(col(textCol))).cast("long").as("_tok"),
      col(charsCol).as("_ch"))
    val sl = base.groupBy(srcCol, langCol)
      .agg(count(lit(1)).as("c"), sum("_tok").as("t"), sum("_ch").as("ch"))
    val s = sl.groupBy(srcCol)
      .agg(sum("c").as("n_docs"), sum("t").as("tok"), sum("ch").as("chars"),
        sort_array(collect_list(struct(col(langCol), col("c")))).as("_lc"))
    val sumClnC = aggregate(col("_lc"), lit(0.0), (acc, x) =>
      acc + x.getField("c").cast("double") *
        log(x.getField("c").cast("double")))
    s.select(col(srcCol), col("n_docs"),
      round(col("tok") / col("n_docs"), 6).as("mean_tok"),
      round(col("chars") / col("n_docs"), 6).as("mean_chars"),
      round(log(col("n_docs").cast("double")) - sumClnC / col("n_docs"), 6)
        .as("lang_entropy"))
  }

  /** Join/aggregation-key skew diagnostic — the pre-flight a 100 TB
    * operator runs before picking salting factors or trusting AQE's
    * skew-join split: per-key count distribution (max / mean / exact
    * p99), the skew factor (max over mean — >10 usually means the
    * hottest key's reduce task dominates the stage), and the named
    * heavy hitters.
    *
    * Scale shape: one hash-aggregate to per-key counts (map-side
    * combined), then ONE aggregate over the (much smaller) count table
    * for the stats and a TakeOrderedAndProject for the heavy hitters —
    * a collect_list-then-slice would buffer every key in one aggregate
    * row, which is exactly the failure mode this report diagnoses. */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("n_rows"),
      max("cnt").as("max_cnt"),
      expr("percentile(cnt, 0.99)").as("_p99"))
    // bounded: limit plans as TakeOrderedAndProject, never a global sort
    val top = counts.orderBy(col("cnt").desc, col("k")).limit(topN)
      .agg(concat_ws(";", transform(
        sort_array(collect_list(struct((-col("cnt")).as("neg"), col("k")))),
        x => concat_ws(":", x.getField("k"),
          (-x.getField("neg")).cast("string")))).as("top_keys"))
    stats.crossJoin(broadcast(top))
      .select(lit(keyCol).as("key_col"), col("n_keys"), col("n_rows"),
        col("max_cnt"),
        round(col("_p99"), 6).as("p99_cnt"),
        round(col("n_rows") / col("n_keys"), 6).as("mean_cnt"),
        round(col("max_cnt") / (col("n_rows") / col("n_keys")), 6)
          .as("skew_factor"),
        col("top_keys"))
  }

  /** Column-level profile drift between two snapshots of the same
    * schema — the data-contract diff a serving pipeline runs between
    * training-time and inference-time data: [[numericProfile]] on each
    * side joined per column, with null-rate delta, distinct-count
    * ratio, and min/max/avg drift. One aggregate pass per side.
    *
    * Interpretation contract: a null-rate jump or a distinct-ratio far
    * from the row-count ratio is schema/ingestion drift (upstream broke
    * something); min/max moves are distribution drift (route to
    * [[Models.psiDrift]] for magnitude). */
  def profileDiff(ref: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame = {
    def nullRate(n: String, nn: String) =
      round(col(nn) / (col(n) + col(nn)), 6)
    val pa = numericProfile(ref, cols)
    val pb0 = numericProfile(cur, cols)
    val pb = pb0.columns.foldLeft(pb0) { (d, c) =>
      if (c == "col_name") d else d.withColumnRenamed(c, c + "_cur")
    }
    pa.join(pb, "col_name")
      .select(col("col_name"),
        col("n_non_null").as("n_ref"), col("n_non_null_cur").as("n_cur"),
        nullRate("n_non_null", "n_null").as("null_rate_ref"),
        nullRate("n_non_null_cur", "n_null_cur").as("null_rate_cur"),
        col("n_distinct").as("n_distinct_ref"),
        col("n_distinct_cur"),
        when(col("n_distinct") > 0,
          round(col("n_distinct_cur") / col("n_distinct"), 6))
          .as("distinct_ratio"),
        col("min_v").as("min_ref"), col("min_v_cur").as("min_cur"),
        col("max_v").as("max_ref"), col("max_v_cur").as("max_cur"),
        col("avg_v").as("avg_ref"), col("avg_v_cur").as("avg_cur"),
        round(col("avg_v_cur") - col("avg_v"), 2).as("avg_delta"))
  }

  /** Order-independent table fingerprint — the O(1)-output equality
    * screen in front of [[MergeUpdate.tableDiff]]: per group, the row
    * count and the XOR-fold of a 60-bit per-row content hash. XOR is
    * commutative and associative with no overflow, so the fingerprint is
    * invariant to row order, partitioning, and merge order — two
    * snapshot runs can each fingerprint their own output and compare 8
    * bytes per group instead of re-reading either table; only groups
    * whose (count, fingerprint) differ need the row-level diff.
    *
    * Rows hash as md5 over the `chr(31)`-joined column strings with an
    * explicit `chr(1)` null marker (concat_ws would silently DROP nulls,
    * colliding ("a", NULL) with (NULL, "a")). Pass integer/string/date
    * columns; cast floats to decimal or round first — float→string
    * rendering is engine-specific. Collision odds per group pair: 2⁻⁶⁰
    * (content screen, not cryptographic).
    *
    * Scale: one codegen'd map pass + one map-side-combined hash agg;
    * only (group, count, 8-byte fingerprint) ever shuffles. */
  def tableFingerprint(
      df: DataFrame,
      cols: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint needs at least one content column")
    val rowHash = Hashing.hash60(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*))
    df.withColumn("_rh", rowHash)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_rh)").as("fingerprint"))
  }

  /** Merkle dataset digest — [[tableFingerprint]] grown into an
    * integrity TREE, the structure that makes 100 TB dataset
    * verification and version diff logarithmic instead of linear: rows
    * hash into 2^`levels` leaf buckets by key, and parents combine
    * children by hashing the pair (`md5(left || '|' || right)`, full
    * 128 bits). Two dataset versions compare root-first: equal roots
    * end the audit in one digest comparison; a mismatch descends only
    * the differing subtrees, so re-verification cost is
    * `levels · (changed leaves)`, and a changed leaf bounds the
    * row-level re-scan to its bucket (~n/2^levels rows). Released as
    * ALL tree nodes — (level, idx, n_rows, digest), level 0 = root —
    * so any two released frames diff by plain join.
    *
    * LEAF DIGEST = additive lattice-style multiset hash: each row
    * hashes to 256 bits (`sha2(canonical, 256)`), split into 8×32-bit
    * limbs, and the leaf sums each limb mod 2^32 (rendered as the
    * 64-hex-char concatenation of the limb sums). Addition is
    * commutative/associative → order- and partition-invariant, and
    * INVERTIBLE → incremental maintenance under inserts, deletes AND
    * updates (subtract the old row's limbs, add the new row's).
    *
    * THREAT MODEL (stated, not implied): this detects accidental
    * corruption, replication divergence, and version drift, and gives
    * margin against crafting adversaries — a collision against the
    * 256-bit carry-free additive state needs a generalized-birthday
    * (k-sum) attack, ~2^(256/(1+log2 k)) work with k CHOSEN inserted
    * rows (e.g. ~2^31 work only if the adversary can insert ~2^16
    * crafted rows). It is NOT an authenticated data structure: there
    * is no secret key, and any party who can rewrite both the data and
    * the published digest can forge trivially. For authenticated
    * integrity, HMAC the canonical row string with a key before
    * hashing. Content swaps BETWEEN rows in the same leaf that
    * preserve the row-hash multiset are invisible by design (the
    * digest is of the multiset, not the sequence). The previous
    * 60-bit-XOR leaf fold (rounds ≤9) cancelled on any even multiset
    * of equal row hashes; the additive fold does not (the
    * duplicate-append regression test in ProfileSpec pins this).
    *
    * Scale shape: ONE map-side-combinable data-scale hash-aggregate
    * (count + 8 limb-sum partials) into ≤ 2^levels rows; the tree fold
    * is a driver-side loop over the collected leaves (bounded by the
    * sketch parameter `levels` ≤ 12, never data scale — the q328
    * posture). Limb sums are exact (no pre-mod overflow) up to 2^31
    * rows per leaf — ~10^12 total rows at levels=12; size `levels` so
    * leaves stay under that. */
  def merkleTree(
      df: DataFrame,
      cols: Seq[String],
      key: Column,
      levels: Int = 12): DataFrame =
    merkleFromLeaves(merkleLeaves(df, cols, key, levels), levels)

  /** Modulus of one 32-bit leaf-digest limb. */
  private val LimbMod = 1L << 32
  private val NLimbs = 8

  /** The data-scale half of [[merkleTree]]: 256-bit canonical row
    * hashes limb-summed into 2^`levels` leaf buckets —
    * `(idx, n, l0..l7)`, ONE map-side-combinable hash-aggregate, also
    * usable as a complete-mode STREAMING state frame (count and limb
    * sums all re-aggregate additively across micro-batches, the q326
    * leaf-store posture).
    *
    * NULL keys bucket under the `chr(1)` sentinel string (documented
    * contract, mirrored in the oracle) instead of surfacing later as a
    * bare NullPointerException in the driver fold; a real key equal to
    * `chr(1)` shares that bucket. */
  def merkleLeaves(
      df: DataFrame,
      cols: Seq[String],
      key: Column,
      levels: Int): DataFrame = {
    require(cols.nonEmpty, "merkleTree needs at least one content column")
    require(levels >= 1 && levels <= 12,
      s"levels must be in [1, 12] (driver collects 2^levels leaves), got $levels")
    // _rh materialized in its OWN projection: the 8 limb substrings
    // reference it, and CollapseProject keeps multiply-referenced
    // non-cheap aliases in their producing Project — one sha256 per
    // row, not eight (the q336 lesson)
    df.select(merkleIdx(key, levels).as("idx"), merkleRowHash(cols).as("_rh"))
      .select(col("idx") +: (0 until NLimbs).map(j =>
        conv(substring(col("_rh"), 8 * j + 1, 8), 16, 10)
          .cast("long").as(s"l$j")): _*)
      .groupBy("idx")
      .agg(count(lit(1)).as("n"),
        (0 until NLimbs).map(j =>
          (sum(col(s"l$j")) % LimbMod).as(s"l$j")): _*)
  }

  /** Leaf-bucket index: null keys map to the `chr(1)` sentinel. */
  private def merkleIdx(key: Column, levels: Int): Column =
    Hashing.hash60(coalesce(key.cast("string"), lit("\u0001"))) % (1 << levels)

  /** 256-bit canonical row hash (chr(31) joins, chr(1) null marker). */
  private def merkleRowHash(cols: Seq[String]): Column =
    sha2(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*), 256)

  /** Driver-side tree fold over a collected `(idx, n, l0..l7)` leaf
    * frame (batch aggregate or drained streaming store) — bounded by
    * the sketch parameter, never data scale. */
  def merkleFromLeaves(leaves: DataFrame, levels: Int): DataFrame =
    foldToFrame(leaves.sparkSession, collectLeaves(leaves, levels), levels)

  /** Collect a bounded `(idx, n, l0..l7)` leaf frame to a driver map. */
  private def collectLeaves(
      leaves: DataFrame, levels: Int): Map[Int, (Long, Array[Long])] = {
    require(levels >= 1 && levels <= 12,
      s"levels must be in [1, 12] (driver collects 2^levels leaves), got $levels")
    val nLeaves = 1 << levels
    // the ONLY data-scale pass happened upstream; this collect is ≤ 2^levels rows
    val got = leaves.select(
        (col("idx") +: col("n") +:
          (0 until NLimbs).map(j => col(s"l$j"))).map(_.cast("long")): _*)
      .collect().map { r =>
        require(!r.isNullAt(0),
          "null leaf idx — the key column bypassed merkleLeaves' null sentinel")
        r.getLong(0).toInt ->
          (r.getLong(1), Array.tabulate(NLimbs)(j => r.getLong(2 + j)))
      }.toMap
    require(got.keys.forall(i => i >= 0 && i < nLeaves),
      s"leaf idx out of [0, $nLeaves)")
    got
  }

  /** 64-hex-char rendering of the 8 limb sums — the leaf digest. */
  private def limbHex(limbs: Array[Long]): String =
    limbs.map(v => f"$v%08x").mkString

  /** The driver tree fold shared by build and incremental update:
    * leaves render as 64-hex-char limb concatenations, parents as the
    * full 32-hex-char md5 of `left || '|' || right`. */
  private def foldToFrame(
      spark: org.apache.spark.sql.SparkSession,
      got: Map[Int, (Long, Array[Long])],
      levels: Int): DataFrame = {
    val nLeaves = 1 << levels
    var lvl: Array[(Long, String)] = Array.tabulate(nLeaves) { i =>
      val (n, limbs) = got.getOrElse(i, (0L, Array.fill(NLimbs)(0L)))
      (n, limbHex(limbs))
    }
    val out = Seq.newBuilder[(Int, Long, Long, String)]
    lvl.zipWithIndex.foreach { case ((n, d), i) =>
      out += ((levels, i.toLong, n, d))
    }
    var level = levels - 1
    while (level >= 0) {
      lvl = Array.tabulate(lvl.length / 2) { i =>
        val (ln, ld) = lvl(2 * i)
        val (rn, rd) = lvl(2 * i + 1)
        (ln + rn, Hashing.md5Hex(s"$ld|$rd"))
      }
      lvl.zipWithIndex.foreach { case ((n, d), i) =>
        out += ((level, i.toLong, n, d))
      }
      level -= 1
    }
    import spark.implicits._
    out.result().toDF("level", "idx", "n_rows", "digest")
  }

  /** Signed leaf corrections for [[merkleApplyDeltas]] from a CDC-style
    * delta feed: `deleted` rows contribute their limbs negatively,
    * `inserted` rows positively (an UPDATE is its old row in `deleted`
    * and its new row in `inserted`). ONE hash-aggregate over the DELTA
    * only — the base is never re-scanned. Output `(idx, dn, dl0..dl7)`;
    * `dn` carries the row-count change, so the digest tracks inserts
    * and deletes, not just updates. */
  def merkleLeafDeltas(
      deleted: DataFrame,
      inserted: DataFrame,
      cols: Seq[String],
      key: Column,
      levels: Int): DataFrame = {
    def limbs(df: DataFrame, sgn: Long) = df
      .select(merkleIdx(key, levels).as("idx"), merkleRowHash(cols).as("_rh"))
      .select(col("idx") +: lit(sgn).as("_sgn") +:
        (0 until NLimbs).map(j =>
          conv(substring(col("_rh"), 8 * j + 1, 8), 16, 10)
            .cast("long").as(s"l$j")): _*)
    limbs(deleted, -1L).unionByName(limbs(inserted, 1L))
      .groupBy("idx")
      .agg(sum(col("_sgn")).as("dn"),
        (0 until NLimbs).map(j =>
          sum(col("_sgn") * col(s"l$j")).as(s"dl$j")): _*)
  }

  /** INCREMENTAL Merkle maintenance — the law the MerkleProps group
    * proves, as a production operator: given the prebuilt base leaves
    * and a frame of signed per-leaf limb corrections
    * ([[merkleLeafDeltas]] over the CDC delta — addition is invertible,
    * so subtracting old rows and adding new ones yields exactly the
    * leaf correction, including row-count changes from inserts and
    * deletes), apply the corrections driver-side mod 2^32 and re-fold.
    * Cost is `O(|delta| + 2^levels)` — the whole point of the tree: a
    * CDC feed maintains a 100 TB dataset's digest without ever
    * re-scanning the base. The released frame is node-identical to a
    * full rebuild over the updated table (the q337 oracle proves
    * exactly this). */
  def merkleApplyDeltas(
      baseLeaves: DataFrame,
      leafDeltas: DataFrame, // (idx, dn, dl0..dl7) — signed corrections
      levels: Int): DataFrame = {
    val base = collectLeaves(baseLeaves, levels)
    val deltas = leafDeltas.select(
        (col("idx") +: col("dn") +:
          (0 until NLimbs).map(j => col(s"dl$j"))).map(_.cast("long")): _*)
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), Array.tabulate(NLimbs)(j => r.getLong(2 + j))))
      .toMap
    require(deltas.keys.forall(i => i >= 0 && i < (1 << levels)),
      s"delta idx out of [0, ${1 << levels})")
    val patched = deltas.foldLeft(base) { case (m, (i, (dn, dl))) =>
      val (n, limbs) = m.getOrElse(i, (0L, Array.fill(NLimbs)(0L)))
      m + (i -> (n + dn, Array.tabulate(NLimbs)(j =>
        java.lang.Math.floorMod(limbs(j) + dl(j), LimbMod))))
    }
    foldToFrame(baseLeaves.sparkSession, patched, levels)
  }

  /** Benford first-digit audit — the fraud/corruption screen for a
    * numeric measure: observed share of each leading significant digit
    * 1–9 vs Benford's law `log10(1 + 1/d)`, with per-digit deviation and
    * the total mean-absolute-deviation repeated on every row.
    *
    * The leading digit is extracted from the STRING form (first `[1-9]`
    * of the decimal or scientific rendering — in scientific notation the
    * mantissa's first digit IS the significant digit), not from
    * `floor(v/10^floor(log10 v))`: the float log10 of an exact power of
    * ten lands just below its integer and misbuckets the whole decade.
    * Scale: one codegen'd regexp projection + one ≤9-row hash-agg;
    * windows touch only the 9-row digit table. Zero and null values
    * carry no leading digit and are excluded. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val d = regexp_extract(col(valueCol).cast("string"), "[1-9]", 0)
    val counts = df
      .where(col(valueCol).isNotNull && col(valueCol) =!= 0)
      // "" (no digit — non-finite renderings) nulls out instead of an
      // ANSI cast error
      .select(when(d =!= "", d).cast("int").as("digit"))
      .where(col("digit").isNotNull)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    counts
      .withColumn("obs_share", round(col("n") / sum(col("n")).over(wAll), 6))
      .withColumn("benford_share", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("abs_dev", round(abs(col("obs_share") - col("benford_share")), 6))
      .withColumn("mad_total",
        round(avg(col("abs_dev")).over(wAll), 6))
  }
}
