package graft.tools

import graft.SessionProfile
import org.apache.spark.sql.SparkSession

/** Round-start environment guard: the driver can regenerate /root/testdata
  * between rounds with different physical schemas (r10 casualty: events.ts
  * moved TIMESTAMP(NANOS)-as-int64 → timestamp[us] and silently broke 10
  * queries + 13 tests). This prints every testdata table's schema AS SPARK
  * READS IT (UTC session, nanosAsLong set — the exact conditions the engine
  * reads under) against the expectation pinned at round 11, and exits
  * non-zero on any drift so the shift is the FIRST thing a session sees,
  * not a mid-round analysis exception.
  *
  * Usage: runMain graft.tools.EnvCheck [sfDir…]  (default: the three SFs)
  */
object EnvCheck {

  /** Pinned round 11 (2026-08-13). Format: col:sparkSimpleType,… */
  val expected: Map[String, String] = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string," +
      "l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int"
  )

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("0.001", "0.01", "0.1").map(s => s"/root/testdata/sf$s")
    val spark = SessionProfile.tune(SparkSession.builder())
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var drift = 0
    for (dir <- dirs; (table, want) <- expected.toSeq.sortBy(_._1)) {
      val path = s"$dir/$table.parquet"
      val got =
        try spark.read.parquet(path).schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        catch { case e: Exception => s"<unreadable: ${e.getMessage}>" }
      if (got != want) {
        drift += 1
        println(s"DRIFT $path")
        println(s"  expected: $want")
        println(s"  actual:   $got")
      }
    }
    if (drift == 0) println(s"EnvCheck OK: ${dirs.size} dirs × ${expected.size} tables match the round-11 pin")
    else println(s"EnvCheck: $drift table(s) drifted — update EventTime/queries + this pin")
    spark.stop()
    if (drift > 0) sys.exit(1)
  }
}
