package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once-shuffle-never layout for hot
  * fact-to-fact joins (SURVEY §7.4.6). */
class StorageSpec extends SparkSpec {

  test("same-bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    val ticks = (1 to 1000).map(i => (s"tok${i % 50}", i.toLong, i * 1.5))
      .toDF("token", "seq", "price")
    val stats = (0 until 50).map(i => (s"tok$i", i * 10L))
      .toDF("token", "score")

    TickTable.saveBucketed(ticks, "bkt_ticks", "token", 8)
    TickTable.saveBucketed(stats, "bkt_stats", "token", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy actually exercises the layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_ticks").join(spark.table("bkt_stats"), "token")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 1000)
      // correctness of the co-located result
      val r = joined.filter(col("token") === "tok7")
        .agg(count(lit(1)), max("score")).head()
      assert(r.getLong(0) === 20L)
      assert(r.getLong(1) === 70L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_ticks")
      spark.sql("DROP TABLE IF EXISTS bkt_stats")
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    import spark.implicits._
    val a = (1 to 100).map(i => (s"k${i % 10}", i)).toDF("token", "x")
    val b = (0 until 10).map(i => (s"k$i", i)).toDF("token", "y")
    TickTable.saveBucketed(a, "bkt_a", "token", 8)
    TickTable.saveBucketed(b, "bkt_b", "token", 3)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "token")
      assert(joined.count() === 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
