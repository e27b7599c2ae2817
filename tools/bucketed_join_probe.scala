// Bucketed vs shuffle big-big join at sf0.1 -- the end-to-end evidence
// behind sources.Bucketing (PlanSpec proves the exchange-free plan;
// this measures it). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.warehouse.dir=/tmp/bucket_probe/warehouse \
//     --conf spark.driver.extraJavaOptions=-Dderby.system.home=/tmp/bucket_probe \
//     -i tools/bucketed_join_probe.scala 2>/dev/null | grep MARKER
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

val sf = "/root/testdata/sf0.1"
val orders = spark.read.parquet(s"$sf/orders.parquet")
val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
// Force the real big-big join shape: at 100 TB neither side broadcasts.
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

Bucketing.write(orders, "/tmp/bucket_probe/orders", "orders_b", Seq("o_orderkey"), 32)
Bucketing.write(lineitem, "/tmp/bucket_probe/lineitem", "lineitem_b", Seq("l_orderkey"), 32)

// The repeated-profile join: per-order-priority revenue stats.
def q(o: DataFrame, l: DataFrame): DataFrame =
  o.join(l, col("o_orderkey") === col("l_orderkey"))
    .groupBy("o_orderpriority")
    .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"), avg("l_discount").as("d"))

def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

val shufQ = q(orders, lineitem)
val buckQ = q(Bucketing.table(spark, "orders_b"), Bucketing.table(spark, "lineitem_b"))
def exchanges(df: DataFrame): Int =
  df.queryExecution.executedPlan.toString.linesIterator.count(l =>
    l.contains("Exchange") && !l.contains("ReusedExchange"))
println(s"MARKER exchanges shuffle=${exchanges(shufQ)} bucketed=${exchanges(buckQ)}")

// Warm both paths once (JIT, parquet footers), then 5 timed runs each.
shufQ.collect(); buckQ.collect()
val shuf = (1 to 5).map(_ => time(q(orders, lineitem).collect()))
val buck = (1 to 5).map(_ => time(
  q(Bucketing.table(spark, "orders_b"), Bucketing.table(spark, "lineitem_b")).collect()))
def fmt(ts: Seq[Double]) = ts.map(t => f"$t%.3f").mkString(",") + f" min=${ts.min}%.3f"
println(s"MARKER shuffle ${fmt(shuf)}")
println(s"MARKER bucketed ${fmt(buck)}")
System.exit(0)
