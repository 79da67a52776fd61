package graft.model

import java.sql.Timestamp

/** Typed row models for the star schema — `Dataset[T]` entry points
  * for pipelines that want compile-time column safety (the
  * reference's per-table column contracts, structures.py:739 etc.,
  * enforced by the Scala compiler instead of runtime KeyErrors).
  */
final case class Lineitem(l_orderkey: Long, l_partkey: Long,
    l_suppkey: Long, l_linenumber: Int, l_quantity: Double,
    l_extendedprice: Double, l_discount: Double, l_tax: Double,
    l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp)

final case class Order(o_orderkey: Long, o_custkey: Long,
    o_orderstatus: String, o_totalprice: Double, o_orderdate: Timestamp,
    o_orderpriority: String)

final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class Document(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

final case class Embedding(vec_id: Long, embedding: Array[Float],
    label: Int)
