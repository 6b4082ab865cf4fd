package graft.etl

/** Column inventories of the reference's five CSV inputs
  * (headers of the CSVs under /root/reference/data; FIXTURES.md §A).
  * Staging is
  * all-string — types are imposed at transform time by guarded casts,
  * reproducing the reference's two-phase typing discipline
  * (stage_csv_dims_to_pg.py:79-98, SURVEY.md §1.3).
  */
object Schemas {
  val busColumns: Seq[String] = Seq(
    "uuid", "waktu_transaksi", "armada_id_var", "no_body_var",
    "card_number_var", "card_type_var", "balance_before_int", "fare_int",
    "balance_after_int", "transcode_txt", "gate_in_boo",
    "p_latitude_flo", "p_longitude_flo", "status_var",
    "free_service_boo", "insert_on_dtm")

  val halteColumns: Seq[String] = Seq(
    "uuid", "waktu_transaksi", "shelter_name_var", "terminal_name_var",
    "card_number_var", "card_type_var", "balance_before_int", "fare_int",
    "balance_after_int", "transcode_txt", "gate_in_boo",
    "p_latitude_flo", "p_longitude_flo", "status_var",
    "free_service_boo", "insert_on_dtm")

  val routesColumns: Seq[String] = Seq("route_code", "route_name")

  val shelterCorridorColumns: Seq[String] =
    Seq("shelter_name_var", "corridor_code", "corridor_name")

  val realisasiColumns: Seq[String] =
    Seq("tanggal_realisasi", "bus_body_no", "rute_realisasi")
}
