package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Status state machines (reference M-5;
  * `services/mock_wms_api/app/main.py:185-207`): linear chains with an
  * absorbing CANCELLED state; unknown states map to themselves. Pure CASE
  * expressions — codegen'd, no shuffle, no UDF.
  */
object StateMachine {

  /** NEW → PROCESSING → FINISHED; CANCELLED absorbing (`main.py:185-192`). */
  val ibChain: Seq[(String, String)] =
    Seq("NEW" -> "PROCESSING", "PROCESSING" -> "FINISHED")

  /** NEW → READYTOPICK → PICKING → PICKED → PACKING → PACKED; CANCELLED
    * absorbing (`main.py:195-207`).
    */
  val obChain: Seq[(String, String)] = Seq(
    "NEW" -> "READYTOPICK", "READYTOPICK" -> "PICKING", "PICKING" -> "PICKED",
    "PICKED" -> "PACKING", "PACKING" -> "PACKED")

  /** Chained-when CASE over an arbitrary transition table; identity for
    * terminal/unknown states.
    */
  def nextStatus(status: Column, chain: Seq[(String, String)]): Column = {
    require(chain.nonEmpty, "empty transition table")
    val first = when(status === lit(chain.head._1), lit(chain.head._2))
    chain.tail.foldLeft(first) {
      case (acc, (from, to)) => acc.when(status === lit(from), lit(to))
    }.otherwise(status)
  }

  def ibNextStatus(status: Column): Column = nextStatus(status, ibChain)
  def obNextStatus(status: Column): Column = nextStatus(status, obChain)
}
