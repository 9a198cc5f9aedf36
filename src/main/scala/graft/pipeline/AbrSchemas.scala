package graft.pipeline

/** The one concretely-evidenced dataset schema: `Agency_Data`, 1 key +
  * 33 compared attributes (+ the `importdate` partition column added by
  * the lake layout). Column list from the reference's delta SELECT list
  * (agency-delta.go:127-160) and change predicate (agency-delta.go:168-200);
  * `pid` is the join key (agency-delta.go:163,240) and is not compared.
  *
  * All columns are strings — Athena text-table parity (SURVEY §1.2).
  * The other 7 datasets have no in-repo schema evidence; they ingest with
  * caller-supplied column lists.
  */
object AbrSchemas {

  val agencyKey = "pid"

  val agencyCompareAttrs: Seq[String] = Seq(
    "abn", "ent_typ_cd", "org_nm", "nm_titl_cd", "prsn_gvn_nm",
    "prsn_othr_gvn_nm", "prsn_fmly_nm", "nm_sufx_cd", "abn_regn_dt",
    "abn_cancn_dt", "mn_trdg_nm", "son_addr_ln_1", "son_addr_ln_2",
    "son_sbrb", "son_stt", "son_pc", "son_cntry_cd", "son_dpid",
    "mn_bus_addr_ln_1", "mn_bus_addr_ln_2", "mn_bus_sbrb", "mn_bus_stt",
    "mn_bus_pc", "mn_bus_cntry_cd", "mn_bus_dpid", "ent_eml",
    "prty_id_blnk", "gst_regn_dt", "gst_cancn_dt", "mn_indy_clsn",
    "mn_indy_clsn_descn", "acn", "sprsn_ind")

  val agencyColumns: Seq[String] = agencyKey +: agencyCompareAttrs
}
