package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinAggSpec extends SparkSpec {
  import spark.implicits._

  test("J1/P3: lookup join maps known codes, falls through unknown, preserves count") {
    val facts = Seq("A", "B", "C", "A", null).toDF("code")
    val mapping = Seq(("A", "Alpha"), ("B", "Beta"), ("Z", "Zeta")).toDF("k", "v")
    val got = Lookup.mapWithDefault(facts, "code", mapping)
    assert(got.count() == 5)
    val vals = got.select("code").as[String].collect().toSeq
    assert(vals.count(_ == "Alpha") == 2 && vals.contains("Beta") && vals.contains("C"))
    assert(vals.count(_ == null) == 1) // null key stays null (no match, fall through)
  }

  test("J1 plan: mapping side is broadcast") {
    val facts = Seq("A").toDF("code")
    val mapping = Seq(("A", "Alpha")).toDF("k", "v")
    val plan = Lookup.mapWithDefault(facts, "code", mapping)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }

  test("A2: distinct-set string join sorts and dedups; sum aggregates") {
    val df = Seq(
      ("d1", "p1", "B", 2.0), ("d1", "p1", "A", 3.0), ("d1", "p1", "B", 5.0),
      ("d2", "p1", "C", 1.0)
    ).toDF("data", "surname", "commessa", "ore")
    val got = Aggregates.setJoinSum(df, Seq("data", "surname"), "commessa", "ore")
      .orderBy("data").collect()
    assert(got(0).getString(2) == "A; B" && got(0).getDouble(3) == 10.0)
    assert(got(1).getString(2) == "C" && got(1).getDouble(3) == 1.0)
  }

  test("A2/A3: idempotence — re-aggregating the aggregate is a no-op") {
    val df = Seq(("d1", "p1", "B; A", 2.0)).toDF("data", "surname", "commessa", "ore")
    val once = Aggregates.setJoinSum(df, Seq("data", "surname"), "commessa", "ore")
    val twice = Aggregates.setJoinSum(once, Seq("data", "surname"), "commessa", "ore")
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("A1: n-key sum preserves total") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val got = Aggregates.sumByKeys(df, Seq("k"), "v", "s")
    assert(got.agg(sum("s")).head().getDouble(0) == 6.0)
  }

  test("S5/J2: merge updates matched rows only, never inserts, count preserved") {
    val target = Seq((1L, "old1", 10.0), (2L, "old2", 20.0), (3L, "old3", 30.0))
      .toDF("id", "commessa", "ore")
    val updates = Seq((2L, "new2", 99.0), (9L, "ghost", 0.0))
      .toDF("id", "commessa", "ore")
    val got = MergeUpdate.updateOnly(target, updates, Seq("id"),
      Map("commessa" -> "commessa", "ore" -> "ore")).orderBy("id").collect()
    assert(got.length == 3) // never insert (id=9 dropped)
    assert(got(0).getString(1) == "old1" && got(0).getDouble(2) == 10.0) // untouched
    assert(got(1).getString(1) == "new2" && got(1).getDouble(2) == 99.0) // updated
    assert(got(2).getString(1) == "old3")
  }

  test("upsert: matched rows take update values verbatim (null overwrites), new keys insert") {
    val target = Seq((1L, "old1", 10.0), (2L, "old2", 20.0), (3L, "old3", 30.0))
      .toDF("id", "commessa", "ore")
    val updates = Seq(
      (2L, "new2", java.lang.Double.valueOf(99.0)),
      (3L, null.asInstanceOf[String], java.lang.Double.valueOf(5.0)), // null OVERWRITES
      (9L, "inserted", java.lang.Double.valueOf(1.0)))                // new key
      .toDF("id", "commessa", "ore")
    val got = MergeUpdate.upsert(target, updates, Seq("id"),
      Map("commessa" -> "commessa", "ore" -> "ore")).orderBy("id").collect()
    assert(got.length == 4) // 3 target + 1 inserted
    assert(got(0).getString(1) == "old1" && got(0).getDouble(2) == 10.0)   // untouched
    assert(got(1).getString(1) == "new2" && got(1).getDouble(2) == 99.0)   // updated
    assert(got(2).isNullAt(1) && got(2).getDouble(2) == 5.0)               // null overwrote
    assert(got(3).getLong(0) == 9L && got(3).getString(1) == "inserted")   // inserted
  }

  test("upsertWithCdf: pre/post pairs for changes, inserts for new keys, silence for no-ops") {
    val target = Seq((1L, "old1", 10.0), (2L, "old2", 20.0), (3L, "old3", 30.0))
      .toDF("id", "commessa", "ore")
    val updates = Seq(
      (2L, "new2", 99.0),  // real change → pre + post
      (3L, "old3", 30.0),  // no-op → NOTHING
      (9L, "ins", 1.0))    // new key → insert
      .toDF("id", "commessa", "ore")
    val got = MergeUpdate.upsertWithCdf(target, updates, Seq("id"),
        Map("commessa" -> "commessa", "ore" -> "ore"))
      .orderBy("id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (2L, "new2", 99.0, "update_postimage"), // 'post' sorts before 'pre'
      (2L, "old2", 20.0, "update_preimage"),
      (9L, "ins", 1.0, "insert")), got.toSeq.toString)
    // replaying the applied state produces an empty feed (replay safety)
    val applied = MergeUpdate.upsert(target, updates, Seq("id"),
      Map("commessa" -> "commessa", "ore" -> "ore"))
    assert(MergeUpdate.upsertWithCdf(applied, updates, Seq("id"),
      Map("commessa" -> "commessa", "ore" -> "ore")).count() == 0)
  }

  test("mergeAdditive: batch-at-a-time equals all-at-once equals full recompute") {
    val all = Seq((1L, 1L, 10.0), (1L, 2L, 5.0), (2L, 1L, 7.0),
      (3L, 3L, 1.0), (3L, 1L, 2.0))
      .toDF("k", "batch", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val full = agg(all).orderBy("k").collect().toSeq
    // batches 1..3 merged incrementally into an empty store
    val empty = agg(all.filter(lit(false)))
    val incremental = (1L to 3L).foldLeft(empty) { (store, b) =>
      MergeUpdate.mergeAdditive(store, agg(all.filter(col("batch") === b)),
        Seq("k"), Map("n" -> "n", "s" -> "s"))
    }.orderBy("k").collect().toSeq
    assert(incremental == full, s"$incremental vs $full")
  }

  test("SCD2: changed keys close+reopen, unchanged untouched, new keys insert, history passes through") {
    val d = java.sql.Date.valueOf(_: String)
    val dim = Seq(
      (1L, "A", d("2024-01-01"), null.asInstanceOf[java.sql.Date]), // will change
      (2L, "B", d("2024-01-01"), null.asInstanceOf[java.sql.Date]), // unchanged update
      (3L, "C", d("2024-01-01"), null.asInstanceOf[java.sql.Date]), // no update
      (1L, "Z", d("2023-01-01"), d("2024-01-01")))                  // closed history
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "A2"), (2L, "B"), (9L, "NEW")).toDF("k", "attr")
    val got = MergeUpdate.scd2(dim, updates, Seq("k"), "attr",
        "valid_from", "valid_to", lit(d("2024-06-01")))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString).orNull))
    assert(got.toSeq == Seq(
      (1L, "Z", "2023-01-01", "2024-01-01"),  // history untouched
      (1L, "A", "2024-01-01", "2024-06-01"),  // closed
      (1L, "A2", "2024-06-01", null),         // reopened
      (2L, "B", "2024-01-01", null),          // unchanged
      (3L, "C", "2024-01-01", null),          // no update
      (9L, "NEW", "2024-06-01", null)))       // new key
  }

  test("SCD2: null attrs — presence is tracked by markers, not attr nullability") {
    val d = java.sql.Date.valueOf(_: String)
    val dim = Seq(
      (1L, null.asInstanceOf[String], d("2024-01-01"), null.asInstanceOf[java.sql.Date]), // null attr, no update
      (2L, null.asInstanceOf[String], d("2024-01-01"), null.asInstanceOf[java.sql.Date]), // null -> "V"
      (3L, "C", d("2024-01-01"), null.asInstanceOf[java.sql.Date]),                       // "C" -> null
      (4L, null.asInstanceOf[String], d("2024-01-01"), null.asInstanceOf[java.sql.Date])) // null -> null (unchanged)
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((2L, "V"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("k", "attr")
    val got = MergeUpdate.scd2(dim, updates, Seq("k"), "attr",
        "valid_from", "valid_to", lit(d("2024-06-01")))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString).orNull))
    assert(got.toSeq == Seq(
      (1L, null, "2024-01-01", null),        // untouched, NOT dropped/rewritten
      (2L, null, "2024-01-01", "2024-06-01"), // closed
      (2L, "V", "2024-06-01", null),          // reopened with value
      (3L, "C", "2024-01-01", "2024-06-01"),  // closed
      (3L, null, "2024-06-01", null),         // reopened with null
      (4L, null, "2024-01-01", null)))        // null -> null is unchanged
  }

  test("SCD2: timestamp validity columns keep their type (null literal derived from schema)") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val dim = Seq((1L, "A", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "B")).toDF("k", "attr")
    val got = MergeUpdate.scd2(dim, updates, Seq("k"), "attr",
      "valid_from", "valid_to", lit(ts("2024-06-01 00:00:00")))
    assert(got.schema("valid_to").dataType == org.apache.spark.sql.types.TimestampType)
    assert(got.count() == 2)
  }

  test("S2: union sheets defaults missing column to sheet name, fills absent cols with null") {
    val s1 = Seq((1L, "X", 5.0)).toDF("id", "commessa", "v")
    val s2 = Seq((2L, 6.0)).toDF("id", "v")        // missing commessa -> sheet name
    val s3 = Seq((3L, "Y")).toDF("id", "commessa") // missing v -> null
    val got = Sources.unionSheets(Seq("A" -> s1, "B" -> s2, "C" -> s3), "commessa")
      .orderBy("id").collect()
    assert(got.map(_.getAs[String]("commessa")).toSeq == Seq("X", "B", "Y"))
    assert(got.map(_.getAs[String]("_sheet")).toSeq == Seq("A", "B", "C"))
    assert(got(2).isNullAt(got(2).fieldIndex("v")))
  }

  test("tableDiff: added/removed/changed/unchanged with per-row changed column names") {
    val ref = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, Some(30.0), "c"), (4L, None, "d"))
      .toDF("k", "v", "s")
    val cur = Seq((1L, Some(10.0), "a"),      // unchanged
      (2L, Some(21.0), "B"),                  // both compare cols changed
      (4L, Some(40.0), "d"),                  // null -> value counts as change
      (5L, Some(50.0), "e"))                  // added; 3 removed
      .toDF("k", "v", "s")
    val got = MergeUpdate.tableDiff(ref, cur, Seq("k"), Seq("v", "s"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(got.toSeq == Seq(
      (1L, "unchanged", None),
      (2L, "changed", Some("v;s")),
      (3L, "removed", None),
      (4L, "changed", Some("v")),
      (5L, "added", None)))
  }

  test("tableDiff: a key listed in compareCols fails fast") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      MergeUpdate.tableDiff(df, df, Seq("k"), Seq("k", "v"))
    }
  }
}
