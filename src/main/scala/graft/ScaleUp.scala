package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-experiment data generator (VERDICT r7 #5): replicate an sf dir
  * R× with per-copy key shifts, preserving schema, value distributions,
  * and referential integrity (copy i's orders reference copy i's
  * customers — each fact FK shifts by the SAME stride as its dimension
  * PK). Dimension tables with scale-invariant cardinality (region,
  * nation) are copied untouched, mirroring how real corpora grow: more
  * facts, same geography. Text/embedding payloads are NOT perturbed, so
  * each document/vector gains 9 exact twins — deliberately: a 10×
  * crawl IS mostly duplicates, and the dedup/near-dup operators' scale
  * behavior under real duplicate mass (df-caps engaging, cluster sizes
  * growing) is exactly what the experiment wants to observe.
  *
  * Output goes under target/ (gitignored scratch): this is a
  * measurement tool, not test data — correctness oracles keep running
  * against the driver-owned /root/testdata dirs.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val r = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head.getLong(0) + 1L

    // key strides, computed from the source so copies never collide
    val kCust = stride(read("customer"), "c_custkey")
    val kSupp = stride(read("supplier"), "s_suppkey")
    val kPart = stride(read("part"), "p_partkey")
    val kOrd = stride(read("orders"), "o_orderkey")
    val kEvt = stride(read("events"), "event_id")
    val kUser = stride(read("events"), "user_id")
    val kDoc = stride(read("documents"), "doc_id")
    val kVec = stride(read("embeddings"), "vec_id")

    def write(df: DataFrame, t: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    /** R copies with `shifts` (column -> stride) applied per copy. */
    def scaled(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val withCopy = df.withColumn("__copy",
        explode(sequence(lit(0L), lit(r - 1L))))
      shifts.foldLeft(withCopy) { case (d, (c, k)) =>
        d.withColumn(c, col(c) + $"__copy" * k)
      }.drop("__copy")
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(scaled(read("customer"), "c_custkey" -> kCust), "customer")
    write(scaled(read("supplier"), "s_suppkey" -> kSupp), "supplier")
    write(scaled(read("part"), "p_partkey" -> kPart), "part")
    write(scaled(read("orders"),
      "o_orderkey" -> kOrd, "o_custkey" -> kCust), "orders")
    write(scaled(read("lineitem"), "l_orderkey" -> kOrd,
      "l_partkey" -> kPart, "l_suppkey" -> kSupp), "lineitem")
    write(scaled(read("events"),
      "event_id" -> kEvt, "user_id" -> kUser), "events")
    write(scaled(read("documents"), "doc_id" -> kDoc), "documents")
    write(scaled(read("embeddings"), "vec_id" -> kVec), "embeddings")
    spark.stop()
  }
}
