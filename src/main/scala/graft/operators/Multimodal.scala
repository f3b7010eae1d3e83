package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY §2i): media payloads ride as opaque binary
  * columns with typed metadata extracted relationally. The decode step
  * itself lives in [[graft.multimodal.MediaPipeline]] (stubbed, spec-
  * tested); this query is the oracled metadata-extraction surface.
  *
  * Scale notes: pure narrow map — binary payloads never leave their
  * partition, metadata extraction is codegen'd; at 100 TB the payload
  * column stays columnar-compressed and is pruned away by any query not
  * touching it.
  */
object Multimodal {

  /** Binary payload + typed metadata (octet length, magic byte, checksum).
    * The payload itself travels the plan as a true binary column; it is
    * hex-encoded only at the oracled projection edge because the driver's
    * pandas-based compare cannot sort raw bytes.
    */
  val binaryMeta = QueryDef(
    "mm_binary_meta",
    """SELECT doc_id, hex(encode(text)) AS payload_hex,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substr(hex(encode(text)), 1, 2) AS magic_hex,
      |  md5(text) AS checksum
      |FROM documents""".stripMargin) { (s, dir) =>
    import s.implicits._
    val payload = $"text".cast("binary")
    Tables.documents(s, dir).select(
      $"doc_id",
      hex(payload).as("payload_hex"),
      length(payload).cast("long").as("n_bytes"),
      substring(hex(payload), 1, 2).as("magic_hex"),
      md5($"text").as("checksum"))
  }

  val defs: Seq[QueryDef] = Seq(binaryMeta)
}
