package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 + CIDR functions — the ClickHouse surface the reference leans on
  * (`IPv4StringToNum` / `IPv4NumToString`, /root/reference/main.go:238)
  * re-expressed as pure Column compositions so they stay inside
  * whole-stage codegen and constant-fold when given literals.
  */
object IpFunctions {

  /** ClickHouse `IPv4StringToNum` analog: dotted-quad string → long.
    * Backed by the native codegen expression (one-pass parse, no regex
    * split / array allocation per row); see [[IpExpressions.ip4ToNum]].
    */
  def ip4ToNum(ip: Column): Column = IpExpressions.ip4ToNum(ip)

  /** ClickHouse `IPv4NumToString` analog: long → dotted-quad string. */
  def numToIp4(n: Column): Column = IpExpressions.numToIp4(n.cast("long"))

  /** Parsed IPv4 CIDR block. Driver-side (tiny, config-like — mirrors the
    * reference's networks_list input, main.go:112-133); the data-side
    * predicate it produces is a numeric range, which Catalyst pushes into
    * the parquet scan when applied to a long column.
    */
  final case class Cidr(networkString: String, start: Long, prefix: Int) {
    def count: Long = 1L << (32 - prefix)
    /** inclusive last address */
    def end: Long = start + count - 1
    /** hostgroup name mangling from the reference (main.go:342-344). */
    def mangledName: String =
      networkString.replace(".", "_").replace("/", "_")
  }

  object Cidr {
    /** Parse "a.b.c.d/p", normalizing to the network address (the
      * reference does the same via net.ParseCIDR — main.go:236-238 notes
      * customers write 192.168.1.33/24 meaning 192.168.1.0/24).
      */
    def parse(s: String): Cidr = {
      val Array(ip, p) = s.split("/")
      val prefix = p.toInt
      require(prefix >= 0 && prefix <= 32, s"bad prefix in $s")
      val quads = ip.split("\\.").map(_.toLong)
      require(quads.length == 4 && quads.forall(q => q >= 0 && q <= 255),
        s"bad IPv4 in $s")
      val raw = (quads(0) << 24) | (quads(1) << 16) | (quads(2) << 8) | quads(3)
      val mask = if (prefix == 0) 0L else (0xffffffffL << (32 - prefix)) & 0xffffffffL
      val start = raw & mask
      val normIp = s"${(start >> 24) & 255}.${(start >> 16) & 255}.${(start >> 8) & 255}.${start & 255}"
      Cidr(s"$normIp/$prefix", start, prefix)
    }
  }

  /** Membership of a numeric IP column in a CIDR — a closed numeric range,
    * so it's sargable (parquet min/max pruning + pushdown). The reference
    * builds the same shape of predicate in SQL (main.go:238), albeit with
    * an off-by-one (`<= start + count` includes one extra address); we use
    * the correct inclusive range.
    */
  def cidrContains(cidr: Cidr, ipNum: Column): Column =
    ipNum >= cidr.start && ipNum <= cidr.end

  def cidrContains(cidr: String, ipNum: Column): Column =
    cidrContains(Cidr.parse(cidr), ipNum)

  /** The /prefix network a numeric IP falls into, as a long (network
    * address). Used to assign rows to networks without any join.
    */
  def networkOf(ipNum: Column, prefix: Int): Column = {
    val mask = if (prefix == 0) 0L else (0xffffffffL << (32 - prefix)) & 0xffffffffL
    ipNum.bitwiseAND(lit(mask))
  }
}
