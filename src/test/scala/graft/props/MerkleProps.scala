package graft.props

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{Hashing, Profile}

/** Merkle dataset-digest invariants (q333/q335): the laws that make the
  * tree usable as a 100 TB integrity structure — internal consistency
  * (every parent folds its children), permutation invariance (the XOR
  * leaf fold cannot see row or partition order), and INCREMENTAL
  * MAINTENANCE: appending one row must equal XOR-ing its hash into one
  * leaf and re-hashing that leaf's root path, with every off-path node
  * untouched. The last law is what lets a petabyte store maintain its
  * digest per-commit instead of re-scanning.
  */
object MerkleProps extends Properties("graft.merkle") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh_").toString)
    .getOrCreate()

  private val genRows: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 60)
    keys <- Gen.listOfN(n, Gen.choose(0L, 100000L))
  } yield keys.distinct.map(k => (k, s"v$k"))

  private val LV = 3 // 8 leaves — small enough to exercise collisions

  private def tree(rows: Seq[(Long, String)]): Map[(Int, Long), (Long, Long)] = {
    import spark.implicits._
    Profile.merkleTree(rows.toDF("k", "s"), Seq("k", "s"), col("k"), LV)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  property("parents fold children; root counts all rows") =
    forAll(genRows) { rows =>
      val t = tree(rows)
      t((0, 0L))._1 == rows.length &&
        (0 until LV).forall { lv =>
          (0 until (1 << lv)).forall { i =>
            val (n, d) = t((lv, i.toLong))
            val (ln, ld) = t((lv + 1, 2L * i))
            val (rn, rd) = t((lv + 1, 2L * i + 1))
            n == ln + rn && d == Hashing.longHash60(s"$ld|$rd")
          }
        }
    }

  property("row order and partitioning are invisible") =
    forAll(genRows) { rows =>
      import spark.implicits._
      val shuffled = Profile.merkleTree(
        scala.util.Random.shuffle(rows).toDF("k", "s").repartition(5),
        Seq("k", "s"), col("k"), LV).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      tree(rows) == shuffled
    }

  property("incremental append = XOR into one leaf + re-hash its root path") =
    forAll(genRows, Gen.choose(100001L, 200000L)) { (rows, newKey) =>
      val before = tree(rows)
      val after = tree(rows :+ (newKey -> s"v$newKey"))
      // replay the incremental update driver-side from `before`
      val rh = Hashing.longHash60(s"$newKey\u001fv$newKey")
      val leaf = Hashing.longHash60(newKey.toString) % (1L << LV)
      val nodes = collection.mutable.Map(before.toSeq: _*)
      val (n0, d0) = nodes((LV, leaf))
      nodes((LV, leaf)) = (n0 + 1, d0 ^ rh)
      var idx = leaf
      var lv = LV - 1
      while (lv >= 0) {
        idx = idx / 2
        val (ln, ld) = nodes((lv + 1, 2 * idx))
        val (rn, rd) = nodes((lv + 1, 2 * idx + 1))
        nodes((lv, idx)) = (ln + rn, Hashing.longHash60(s"$ld|$rd"))
        lv -= 1
      }
      nodes.toMap == after
    }
}
