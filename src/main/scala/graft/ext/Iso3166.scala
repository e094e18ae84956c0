package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full ISO 3166-1 country dimension: English short name → alpha-2
  * code, with common-name aliases and a deterministic, SQL-mirrorable
  * name normalization — the engine-side analog of the reference's
  * pycountry lookup chain (`/root/reference/streamlit_app.py:84`,
  * `global_vaccination_coverage_explorer_app.py:104`: exact name →
  * fuzzy search → None), re-expressed as a broadcast dim join so the
  * lookup is a plan-visible `BroadcastHashJoin`, not a per-row Python
  * call.
  *
  * Resolution contract:
  *   - matching is on [[normalize]]d names (case/punctuation/diacritic
  *     insensitive, whitespace collapsed), so "Viet Nam", "vietnam"
  *     and "VIETNAM" all hit VN;
  *   - [[aliases]] covers the common-name ↔ official-name gap
  *     ("USA", "South Korea", "Russia", "Czech Republic", …) — the
  *     role pycountry's fuzzy search plays, but table-driven and
  *     therefore deterministic and engine-portable;
  *   - a miss resolves to NULL (callers coalesce to their fallback,
  *     mirroring the reference's `except LookupError: return None`).
  *
  * The table is assembled from public knowledge (the ISO 3166-1
  * standard's published assignments); it is a literal dim — tiny,
  * broadcast, never shuffled — exactly like the reference ships
  * pycountry's bundled dataset.
  */
object Iso3166 {

  /** ISO 3166-1 English short names → officially assigned alpha-2
    * codes (249 entries). */
  val officialNames: Seq[(String, String)] = Seq(
    "Afghanistan" -> "AF", "Aland Islands" -> "AX", "Albania" -> "AL",
    "Algeria" -> "DZ", "American Samoa" -> "AS", "Andorra" -> "AD",
    "Angola" -> "AO", "Anguilla" -> "AI", "Antarctica" -> "AQ",
    "Antigua and Barbuda" -> "AG", "Argentina" -> "AR", "Armenia" -> "AM",
    "Aruba" -> "AW", "Australia" -> "AU", "Austria" -> "AT",
    "Azerbaijan" -> "AZ", "Bahamas" -> "BS", "Bahrain" -> "BH",
    "Bangladesh" -> "BD", "Barbados" -> "BB", "Belarus" -> "BY",
    "Belgium" -> "BE", "Belize" -> "BZ", "Benin" -> "BJ",
    "Bermuda" -> "BM", "Bhutan" -> "BT",
    "Bolivia (Plurinational State of)" -> "BO",
    "Bonaire, Sint Eustatius and Saba" -> "BQ",
    "Bosnia and Herzegovina" -> "BA", "Botswana" -> "BW",
    "Bouvet Island" -> "BV", "Brazil" -> "BR",
    "British Indian Ocean Territory" -> "IO", "Brunei Darussalam" -> "BN",
    "Bulgaria" -> "BG", "Burkina Faso" -> "BF", "Burundi" -> "BI",
    "Cabo Verde" -> "CV", "Cambodia" -> "KH", "Cameroon" -> "CM",
    "Canada" -> "CA", "Cayman Islands" -> "KY",
    "Central African Republic" -> "CF", "Chad" -> "TD", "Chile" -> "CL",
    "China" -> "CN", "Christmas Island" -> "CX",
    "Cocos (Keeling) Islands" -> "CC", "Colombia" -> "CO",
    "Comoros" -> "KM", "Congo" -> "CG",
    "Congo, Democratic Republic of the" -> "CD", "Cook Islands" -> "CK",
    "Costa Rica" -> "CR", "Cote d'Ivoire" -> "CI", "Croatia" -> "HR",
    "Cuba" -> "CU", "Curacao" -> "CW", "Cyprus" -> "CY",
    "Czechia" -> "CZ", "Denmark" -> "DK", "Djibouti" -> "DJ",
    "Dominica" -> "DM", "Dominican Republic" -> "DO", "Ecuador" -> "EC",
    "Egypt" -> "EG", "El Salvador" -> "SV", "Equatorial Guinea" -> "GQ",
    "Eritrea" -> "ER", "Estonia" -> "EE", "Eswatini" -> "SZ",
    "Ethiopia" -> "ET", "Falkland Islands (Malvinas)" -> "FK",
    "Faroe Islands" -> "FO", "Fiji" -> "FJ", "Finland" -> "FI",
    "France" -> "FR", "French Guiana" -> "GF", "French Polynesia" -> "PF",
    "French Southern Territories" -> "TF", "Gabon" -> "GA",
    "Gambia" -> "GM", "Georgia" -> "GE", "Germany" -> "DE",
    "Ghana" -> "GH", "Gibraltar" -> "GI", "Greece" -> "GR",
    "Greenland" -> "GL", "Grenada" -> "GD", "Guadeloupe" -> "GP",
    "Guam" -> "GU", "Guatemala" -> "GT", "Guernsey" -> "GG",
    "Guinea" -> "GN", "Guinea-Bissau" -> "GW", "Guyana" -> "GY",
    "Haiti" -> "HT", "Heard Island and McDonald Islands" -> "HM",
    "Holy See" -> "VA", "Honduras" -> "HN", "Hong Kong" -> "HK",
    "Hungary" -> "HU", "Iceland" -> "IS", "India" -> "IN",
    "Indonesia" -> "ID", "Iran (Islamic Republic of)" -> "IR",
    "Iraq" -> "IQ", "Ireland" -> "IE", "Isle of Man" -> "IM",
    "Israel" -> "IL", "Italy" -> "IT", "Jamaica" -> "JM",
    "Japan" -> "JP", "Jersey" -> "JE", "Jordan" -> "JO",
    "Kazakhstan" -> "KZ", "Kenya" -> "KE", "Kiribati" -> "KI",
    "Korea (Democratic People's Republic of)" -> "KP",
    "Korea, Republic of" -> "KR", "Kuwait" -> "KW", "Kyrgyzstan" -> "KG",
    "Lao People's Democratic Republic" -> "LA", "Latvia" -> "LV",
    "Lebanon" -> "LB", "Lesotho" -> "LS", "Liberia" -> "LR",
    "Libya" -> "LY", "Liechtenstein" -> "LI", "Lithuania" -> "LT",
    "Luxembourg" -> "LU", "Macao" -> "MO", "Madagascar" -> "MG",
    "Malawi" -> "MW", "Malaysia" -> "MY", "Maldives" -> "MV",
    "Mali" -> "ML", "Malta" -> "MT", "Marshall Islands" -> "MH",
    "Martinique" -> "MQ", "Mauritania" -> "MR", "Mauritius" -> "MU",
    "Mayotte" -> "YT", "Mexico" -> "MX",
    "Micronesia (Federated States of)" -> "FM",
    "Moldova, Republic of" -> "MD", "Monaco" -> "MC", "Mongolia" -> "MN",
    "Montenegro" -> "ME", "Montserrat" -> "MS", "Morocco" -> "MA",
    "Mozambique" -> "MZ", "Myanmar" -> "MM", "Namibia" -> "NA",
    "Nauru" -> "NR", "Nepal" -> "NP", "Netherlands" -> "NL",
    "New Caledonia" -> "NC", "New Zealand" -> "NZ", "Nicaragua" -> "NI",
    "Niger" -> "NE", "Nigeria" -> "NG", "Niue" -> "NU",
    "Norfolk Island" -> "NF", "North Macedonia" -> "MK",
    "Northern Mariana Islands" -> "MP", "Norway" -> "NO", "Oman" -> "OM",
    "Pakistan" -> "PK", "Palau" -> "PW", "Palestine, State of" -> "PS",
    "Panama" -> "PA", "Papua New Guinea" -> "PG", "Paraguay" -> "PY",
    "Peru" -> "PE", "Philippines" -> "PH", "Pitcairn" -> "PN",
    "Poland" -> "PL", "Portugal" -> "PT", "Puerto Rico" -> "PR",
    "Qatar" -> "QA", "Reunion" -> "RE", "Romania" -> "RO",
    "Russian Federation" -> "RU", "Rwanda" -> "RW",
    "Saint Barthelemy" -> "BL",
    "Saint Helena, Ascension and Tristan da Cunha" -> "SH",
    "Saint Kitts and Nevis" -> "KN", "Saint Lucia" -> "LC",
    "Saint Martin (French part)" -> "MF",
    "Saint Pierre and Miquelon" -> "PM",
    "Saint Vincent and the Grenadines" -> "VC", "Samoa" -> "WS",
    "San Marino" -> "SM", "Sao Tome and Principe" -> "ST",
    "Saudi Arabia" -> "SA", "Senegal" -> "SN", "Serbia" -> "RS",
    "Seychelles" -> "SC", "Sierra Leone" -> "SL", "Singapore" -> "SG",
    "Sint Maarten (Dutch part)" -> "SX", "Slovakia" -> "SK",
    "Slovenia" -> "SI", "Solomon Islands" -> "SB", "Somalia" -> "SO",
    "South Africa" -> "ZA",
    "South Georgia and the South Sandwich Islands" -> "GS",
    "South Sudan" -> "SS", "Spain" -> "ES", "Sri Lanka" -> "LK",
    "Sudan" -> "SD", "Suriname" -> "SR",
    "Svalbard and Jan Mayen" -> "SJ", "Sweden" -> "SE",
    "Switzerland" -> "CH", "Syrian Arab Republic" -> "SY",
    "Taiwan, Province of China" -> "TW", "Tajikistan" -> "TJ",
    "Tanzania, United Republic of" -> "TZ", "Thailand" -> "TH",
    "Timor-Leste" -> "TL", "Togo" -> "TG", "Tokelau" -> "TK",
    "Tonga" -> "TO", "Trinidad and Tobago" -> "TT", "Tunisia" -> "TN",
    "Turkiye" -> "TR", "Turkmenistan" -> "TM",
    "Turks and Caicos Islands" -> "TC", "Tuvalu" -> "TV",
    "Uganda" -> "UG", "Ukraine" -> "UA",
    "United Arab Emirates" -> "AE",
    "United Kingdom of Great Britain and Northern Ireland" -> "GB",
    "United States of America" -> "US",
    "United States Minor Outlying Islands" -> "UM", "Uruguay" -> "UY",
    "Uzbekistan" -> "UZ", "Vanuatu" -> "VU",
    "Venezuela (Bolivarian Republic of)" -> "VE", "Viet Nam" -> "VN",
    "Virgin Islands (British)" -> "VG", "Virgin Islands (U.S.)" -> "VI",
    "Wallis and Futuna" -> "WF", "Western Sahara" -> "EH",
    "Yemen" -> "YE", "Zambia" -> "ZM", "Zimbabwe" -> "ZW",
  )

  /** Common/colloquial names → alpha-2 — the deterministic stand-in
    * for pycountry's fuzzy search. Every alias resolves to a code that
    * also appears in [[officialNames]]. */
  val aliases: Seq[(String, String)] = Seq(
    "United States" -> "US", "USA" -> "US", "U.S.A." -> "US",
    "America" -> "US", "US" -> "US",
    "United Kingdom" -> "GB", "UK" -> "GB", "Great Britain" -> "GB",
    "Britain" -> "GB", "England" -> "GB",
    "South Korea" -> "KR", "Republic of Korea" -> "KR", "Korea" -> "KR",
    "North Korea" -> "KP",
    "Democratic People's Republic of Korea" -> "KP",
    "Russia" -> "RU", "Vietnam" -> "VN", "Laos" -> "LA",
    "Syria" -> "SY", "Iran" -> "IR", "Bolivia" -> "BO",
    "Venezuela" -> "VE", "Tanzania" -> "TZ", "Moldova" -> "MD",
    "Brunei" -> "BN", "Cape Verde" -> "CV", "Czech Republic" -> "CZ",
    "Swaziland" -> "SZ", "Burma" -> "MM", "Macedonia" -> "MK",
    "Turkey" -> "TR", "Ivory Coast" -> "CI",
    "Democratic Republic of the Congo" -> "CD", "DR Congo" -> "CD",
    "Congo-Kinshasa" -> "CD", "Republic of the Congo" -> "CG",
    "Congo-Brazzaville" -> "CG",
    "The Gambia" -> "GM", "The Bahamas" -> "BS",
    "Vatican City" -> "VA", "Vatican" -> "VA",
    "Palestine" -> "PS", "Micronesia" -> "FM", "East Timor" -> "TL",
    "Taiwan" -> "TW", "Falkland Islands" -> "FK",
    "Saint Helena" -> "SH", "Saint Martin" -> "MF",
    "Sint Maarten" -> "SX", "Virgin Islands" -> "VI",
    "British Virgin Islands" -> "VG", "US Virgin Islands" -> "VI",
    "Cocos Islands" -> "CC", "Keeling Islands" -> "CC",
    "Macau" -> "MO", "United Arab Republic" -> "EG",
    "Holland" -> "NL", "Myanmar (Burma)" -> "MM",
    "Timor Leste" -> "TL", "Sao Tome" -> "ST",
    "Antigua" -> "AG", "Trinidad" -> "TT",
    "Saint Kitts" -> "KN", "Saint Vincent" -> "VC",
    "Bosnia" -> "BA", "Herzegovina" -> "BA",
    "Slovak Republic" -> "SK", "Kyrgyz Republic" -> "KG",
    "UAE" -> "AE",
  )

  /** Diacritic fold used by [[normalize]]/[[normalizeCol]] — covers
    * the accented characters appearing in ISO names and their common
    * spellings ("Côte d'Ivoire", "Curaçao", "Türkiye", "Åland",
    * "Réunion", "São Tomé"). One-to-one char translate so the SAME
    * fold is expressible as `translate()` in Spark AND the DuckDB
    * oracle — no locale-dependent collation anywhere. */
  private val accented = "áàâäãåéèêëíìîïóòôöõøúùûüçñýÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕØÚÙÛÜÇÑÝ"
  private val folded   = "aaaaaaeeeeiiiioooooouuuucnyAAAAAAEEEEIIIIOOOOOOUUUUCNY"
  require(accented.length == folded.length, "diacritic fold tables must align")

  /** Normalize a country name for matching: diacritic-fold, lowercase,
    * strip `.`/`'`/`,`/`(`/`)`, hyphens→space, collapse whitespace,
    * trim. Deterministic and mirrorable (`lower`, `translate`,
    * `regexp_replace` exist in both Spark and DuckDB with these
    * semantics). */
  def normalize(name: String): String = {
    val foldedStr = name.map { ch =>
      val i = accented.indexOf(ch.toInt)
      if (i >= 0) folded(i) else ch
    }
    // Locale.ROOT: default-locale toLowerCase diverges from Spark's
    // locale-independent lower() under tr_TR/az (I → dotless ı),
    // which would silently miss every name containing an I
    foldedStr.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[.',()]", "")
      .replaceAll("-", " ")
      .replaceAll("\\s+", " ")
      .trim
  }

  /** Column form of [[normalize]] — same fold, same order. */
  def normalizeCol(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(translate(c, accented, folded)), "[.',()]", ""),
        "-", " "),
      "\\s+", " "))

  /** DuckDB-SQL form of [[normalize]] over the expression `expr` —
    * the oracle-side mirror, kept HERE so all three normalizations
    * (driver, Spark column, oracle SQL) derive from the same fold
    * tables and step order. DuckDB's `regexp_replace` replaces only
    * the first match without the 'g' flag (Spark replaces all), hence
    * the explicit 'g' on every step. The char-class literal contains a
    * single quote — doubled for SQL. */
  def normalizeSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace(" +
      s"lower(translate($expr, '$accented', '$folded'))" +
      s", '[.'',()]', '', 'g'), '-', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** The resolved dim: (name_norm, alpha2), one row per distinct
    * normalized name (officials + aliases; aliases never shadow an
    * official name). 249 distinct codes. */
  val dim: Seq[(String, String)] = {
    val official = officialNames.map { case (n, a) => normalize(n) -> a }
    val extra = aliases.map { case (n, a) => normalize(n) -> a }
      .filterNot { case (n, _) => official.exists(_._1 == n) }
    (official ++ extra).distinctBy(_._1)
  }

  /** Flag-emoji column for an alpha-2 code (regional-indicator
    * arithmetic — `format_string("%c")` takes full code points;
    * `char()` is mod-256 and can't reach plane 1). */
  def flagCol(alpha2: Column): Column =
    format_string("%c%c",
      ascii(substring(alpha2, 1, 1)) - lit(65) + lit(127462),
      ascii(substring(alpha2, 2, 1)) - lit(65) + lit(127462))

  /** Resolve `nameCol` against the full dim: broadcast left join on
    * normalized names adding `alpha2` (NULL on miss — the caller owns
    * the fallback, like the reference's `None`). The dim is 300-ish
    * rows — always broadcast, never shuffled; the fact side streams
    * through the join untouched. */
  def resolve(df: DataFrame, nameCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = broadcast(dim.toDF("_iso_norm", "alpha2"))
    df.withColumn("_iso_norm", normalizeCol(col(nameCol)))
      .join(d, Seq("_iso_norm"), "left")
      .drop("_iso_norm")
  }
}
