"""Document-type detection (operators D1-D8, SURVEY.md §2.3) as one
generated Catalyst ``when``-chain — the columnar form of the reference's
three-step first-match-wins cascade (document_type_detector.py:237-554):

  STEP 1 keyword + province/state/country rules (conf 0.75-0.9)
  STEP 2 document-number format fallback      (conf 0.7)
  STEP 3 pattern-match scoring fallback       (argmax, <0.3 -> UNKNOWN)

Everything is constant-foldable expression logic over the 13 field
columns; Catalyst fuses it with the rest of the projection (no joins,
no shuffles, no Python). detected_features strings are reproduced for
the step-1/2 branches; step-3's per-keyword feature strings are
simplified to a single marker (documented divergence — the scores and
chosen types are exact).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webxtract import rules
from webxtract.schemas import FIELD_NAMES


def _contains_any(text: Column, keywords: list[str]) -> Column:
    return reduce(or_, [text.contains(F.lit(k)) for k in keywords])


def _lower(col: Column) -> Column:
    return F.lower(F.coalesce(col, F.lit("")))


def _type_struct(
    document_type: Column | str,
    confidence: float | Column,
    country: Column | str | None,
    state_province: Column | str | None,
    document_name: Column | str,
    features: Column | list[str],
) -> Column:
    def _c(v, name):  # noqa: ANN001
        if isinstance(v, Column):
            return v.alias(name)
        return F.lit(v).cast("string").alias(name)

    conf = confidence if isinstance(confidence, Column) else F.lit(float(confidence))
    feats = (
        features
        if isinstance(features, Column)
        else F.array(*[F.lit(x) for x in features])
        if features
        else F.array().cast("array<string>")
    )
    return F.struct(
        _c(document_type, "document_type"),
        conf.cast("double").alias("confidence"),
        _c(country, "country"),
        _c(state_province, "state_province"),
        _c(document_name, "document_name"),
        feats.alias("detected_features"),
    )


def _first_match(text: Column, mapping: dict[str, str]) -> Column:
    """Ordered substring-scan lookup: first key contained in ``text`` wins
    (detector :556-581). Returns the mapped value or NULL."""
    expr = F.lit(None).cast("string")
    chain = None
    for key, value in mapping.items():
        cond = text.contains(F.lit(key))
        chain = (
            F.when(cond, F.lit(value))
            if chain is None
            else chain.when(cond, F.lit(value))
        )
    return chain.otherwise(expr) if chain is not None else expr


# Precomputed detection-input columns. Detection references the
# assembled full text / cleaned number / province in ~200 predicate
# sites; materializing them once per row keeps the expression tree
# linear and lets codegen/CSE work (a 20x stage speedup at bench).
_TMP = [
    "__dt_ft", "__dt_numu", "__dt_numc", "__dt_title",
    "__dt_prov", "__dt_state", "__dt_cc",
]


def with_detection_inputs(df: DataFrame, prefix: str = "") -> DataFrame:
    col = lambda name: F.col(prefix + name)  # noqa: E731

    # D1 full-text assembly (detector :584-590): lower-cased join of the
    # non-empty string fields in schema order.
    full_text_lower = F.lower(
        F.concat_ws(
            " ",
            F.filter(
                F.array(*[col(n) for n in FIELD_NAMES]),
                lambda v: v.isNotNull() & (v != F.lit("")),
            ),
        )
    )
    document_number = F.coalesce(col("document_number"), F.lit(""))
    df = (
        df.withColumn("__dt_ft", full_text_lower)
        .withColumn("__dt_numu", F.upper(F.trim(document_number)))
        .withColumn(
            "__dt_numc",
            F.regexp_replace(F.upper(F.trim(document_number)), r"[\s\-]", ""),
        )
        .withColumn("__dt_title", _lower(col("document_title")))
        .withColumn("__dt_cc", F.upper(F.coalesce(col("country_code"), F.lit(""))))
    )
    # D3 province / US-state detection (detector :556-581): full names
    # first, then abbreviations; "québec" normalizes to "quebec".
    ft = F.col("__dt_ft")
    province_names = {
        k: ("quebec" if k == "québec" else k) for k in rules.PROVINCE_MAPPING
    }
    return df.withColumn(
        "__dt_prov",
        F.coalesce(
            _first_match(ft, province_names),
            _first_match(ft, rules.PROVINCE_ABBREV),
        ),
    ).withColumn(
        "__dt_state",
        F.coalesce(
            _first_match(ft, {k: k for k in rules.US_STATE_MAPPING}),
            _first_match(ft, rules.US_STATE_ABBREV),
        ),
    )


def doc_type_expr(prefix: str = "") -> Column:
    """Build the DocumentTypeInfo struct. Requires the precomputed
    detection-input columns (apply with_detection_inputs first, or use
    with_doc_type which wraps both)."""
    col = lambda name: F.col(prefix + name)  # noqa: E731

    address = F.coalesce(col("address"), F.lit(""))
    country_code = F.col("__dt_cc")
    document_title = F.col("__dt_title")
    full_text_lower = F.col("__dt_ft")
    clean_doc_number = F.col("__dt_numc")
    doc_number_upper = F.col("__dt_numu")
    detected_province = F.col("__dt_prov")
    detected_us_state = F.col("__dt_state")

    # D2 keyword flags (detector :267-281)
    has_passport_kw = _contains_any(full_text_lower, rules.PASSPORT_KEYWORDS)
    has_dl_kw = _contains_any(full_text_lower, rules.DL_KEYWORDS)
    has_health_kw = _contains_any(full_text_lower, rules.HEALTH_CARD_KEYWORDS)
    has_photo_kw = _contains_any(full_text_lower, rules.PHOTO_ID_KEYWORDS)
    has_pr_kw = _contains_any(full_text_lower, rules.PR_CARD_KEYWORDS)
    has_permanent = full_text_lower.contains("permanent") | document_title.contains(
        "permanent"
    )

    is_pr_by_title = document_title.contains("permanent resident") | (
        document_title.contains("résident permanent")
    )
    is_passport_by_title = document_title.contains("passport") & ~document_title.contains(
        "permanent"
    )
    is_photo_by_title = (
        document_title.contains("photo")
        | document_title.contains("identification")
        | document_title.contains("identity")
        | document_title.contains("services card")
        | document_title.contains("bcid")
    )

    # D4 country inference (detector :289-305)
    has_gov_canada = full_text_lower.contains(
        "government of canada"
    ) | full_text_lower.contains("gouvernement du canada")
    is_canada = (
        full_text_lower.contains("canada")
        | (country_code == "CAN")
        | detected_province.isNotNull()
        | has_gov_canada
    )
    is_usa = (
        full_text_lower.contains("united states")
        | full_text_lower.contains("usa")
        | (country_code == "USA")
        | detected_us_state.isNotNull()
    )

    # ---------------------------------------------------------------- D5
    # STEP 1 cascade, exact branch order (detector :314-473).
    chain = F.when(
        (has_pr_kw | has_permanent | is_pr_by_title) & is_canada,
        _type_struct(
            "canada_pr_card", 0.9, "Canada", None,
            "Canada Permanent Residence Card",
            ["pr_card_keyword_found", "country: Canada"],
        ),
    )

    # 1b photo card / photo id
    photo_cond = (has_photo_kw | is_photo_by_title) & ~has_passport_kw & ~has_dl_kw
    photo_struct = None
    for prov, (dtype, state, name) in rules.PHOTO_ID_TYPES.items():
        branch = _type_struct(
            dtype, 0.9, "Canada", state, name,
            F.array(
                F.lit("photo_id_keyword_found"), F.concat(F.lit("province: "), F.lit(prov))
            ),
        )
        photo_struct = (
            F.when(detected_province == prov, branch)
            if photo_struct is None
            else photo_struct.when(detected_province == prov, branch)
        )
    photo_struct = photo_struct.otherwise(
        _type_struct(
            "generic_photo_id", 0.7, None, None, "Photo ID",
            ["photo_id_keyword_found"],
        )
    )
    chain = chain.when(photo_cond, photo_struct)

    # 1c health card (only the Ontario/ohip inner branch returns)
    chain = chain.when(
        has_health_kw
        & ~has_passport_kw
        & ((detected_province == "ontario") | full_text_lower.contains("ohip")),
        _type_struct(
            "ontario_health_card", 0.9, "Canada", "Ontario",
            "Ontario Health Card",
            ["health_card_keyword_found", "province: ontario"],
        ),
    )

    # 1d driver's licence
    dl_cond = has_dl_kw & ~has_passport_kw
    for prov, (dtype, state, name) in rules.DL_TYPES.items():
        chain = chain.when(
            dl_cond & (detected_province == prov),
            _type_struct(
                dtype, 0.85, "Canada", state, name,
                F.array(
                    F.lit("dl_keyword_found"),
                    F.concat(F.lit("province: "), F.lit(prov)),
                ),
            ),
        )
    for state_key, (dtype, state, name) in rules.US_DL_TYPES.items():
        chain = chain.when(
            dl_cond & (detected_us_state == state_key),
            _type_struct(
                dtype, 0.85, "United States", state, name,
                F.array(
                    F.lit("dl_keyword_found"),
                    F.concat(F.lit("us_state: "), F.lit(state_key)),
                ),
            ),
        )
    # generic US DL for the other mapped states
    for state_key, state_name in rules.US_STATE_MAPPING.items():
        if state_key in rules.US_DL_TYPES:
            continue
        chain = chain.when(
            dl_cond & (detected_us_state == state_key),
            _type_struct(
                "us_drivers_license", 0.8, "United States", state_name,
                f"{state_name} Driver's License",
                F.array(
                    F.lit("dl_keyword_found"),
                    F.concat(F.lit("us_state: "), F.lit(state_key)),
                ),
            ),
        )

    # 1e passport
    pass_cond = has_passport_kw | is_passport_by_title
    has_cc = country_code != F.lit("")
    # specific passports: first DOCUMENT_PATTERNS entry with matching
    # country_code (detector :431-448)
    for dtype, name, country, cc, _state, _fmt, _kws in rules.DOCUMENT_PATTERNS:
        if not cc:
            continue
        chain = chain.when(
            pass_cond & has_cc & (country_code == cc),
            _type_struct(
                dtype, 0.9, country, None, name,
                F.array(
                    F.lit("passport_keyword_found"),
                    F.concat(F.lit("country_code: "), country_code),
                ),
            ),
        )
    # generic passport by ISO country (detector :449-461): dynamic type
    in_iso = country_code.isin(list(rules.COUNTRY_CODES))
    country_name = _first_map_lookup(country_code)
    chain = chain.when(
        pass_cond & has_cc & in_iso,
        _type_struct(
            F.concat(
                F.lower(F.regexp_replace(country_name, " ", "_")),
                F.lit("_passport"),
            ),
            0.85,
            country_name,
            None,
            F.concat(country_name, F.lit(" Passport")),
            F.array(
                F.lit("passport_keyword_found"),
                F.concat(F.lit("country_code: "), country_code),
            ),
        ),
    )
    # passport keyword, no country code at all (detector :462-473)
    chain = chain.when(
        pass_cond & ~has_cc,
        _type_struct(
            "generic_passport", 0.75, None, None, "Passport",
            ["passport_keyword_found", "no_country_code"],
        ),
    )

    # ---------------------------------------------------------------- D6
    # STEP 2: doc-number format fallback (detector :480-494), conf 0.7.
    for dtype, pattern, country, state, name in rules.DOC_NUMBER_FORMATS:
        chain = chain.when(
            (clean_doc_number != "")
            & (doc_number_upper.rlike(pattern) | clean_doc_number.rlike(pattern)),
            _type_struct(
                dtype, 0.7, country, state, name,
                ["document_number_format_match", f"pattern: {pattern}"],
            ),
        )

    # ---------------------------------------------------------------- D7
    # STEP 3: pattern-match scoring (detector :497-554, :592-649).
    scores: list[Column] = []
    structs: list[Column] = []
    for dtype, name, country, cc, state, fmt, keywords in rules.DOCUMENT_PATTERNS:
        is_passport_type = "passport" in name.lower()
        s = F.lit(0.0)
        if cc and is_passport_type:
            s = s + F.when(
                (country_code != "") & (country_code == cc), 0.5
            ).otherwise(0.0)
        if fmt:
            s = s + F.when(
                (doc_number_upper != "") & doc_number_upper.rlike(fmt), 0.4
            ).otherwise(0.0)
        kw_hits = F.size(
            F.filter(
                F.array(*[F.lit(k.lower()) for k in keywords]),
                lambda k: full_text_lower.contains(k),
            )
        )
        s = s + F.when(
            kw_hits > 0, F.least(kw_hits.cast("double") * 0.15, F.lit(0.45))
        ).otherwise(0.0)
        if dtype == "ontario_drivers_license":
            ontario_ind = [
                "ontario", " on ", ", on", "on,", "toronto", "ottawa", "mississauga",
            ]
            addr_lower = F.lower(address)
            s = s + F.when(
                reduce(
                    or_,
                    [
                        addr_lower.contains(F.lit(i)) | full_text_lower.contains(F.lit(i))
                        for i in ontario_ind
                    ],
                ),
                0.15,
            ).otherwise(0.0)
        scores.append(s)
        structs.append(
            _type_struct(
                dtype,
                s,
                country,
                state,
                name,
                ["pattern_score_match"],
            )
        )

    best_score = F.greatest(*scores)
    # first strict maximum wins (reference uses `>` so earlier entries win ties)
    score_chain = None
    for s, st in zip(scores, structs, strict=True):
        cond = s == best_score
        score_chain = (
            F.when(cond, st) if score_chain is None else score_chain.when(cond, st)
        )

    # last resort (detector :524-538): passport kw + ISO cc -> 0.6 dynamic
    last_resort = F.when(
        has_passport_kw & has_cc & in_iso,
        _type_struct(
            F.concat(
                F.lower(F.regexp_replace(country_name, " ", "_")),
                F.lit("_passport"),
            ),
            0.6,
            country_name,
            None,
            F.concat(country_name, F.lit(" Passport")),
            F.array(
                F.lit("passport_keyword_found"),
                F.concat(F.lit("country_code: "), country_code),
            ),
        ),
    ).otherwise(
        _type_struct("unknown", 0.0, None, None, "Unknown Document", [])
    )

    step3 = F.when(best_score >= 0.3, score_chain).otherwise(last_resort)

    return chain.otherwise(step3)


def _first_map_lookup(country_code: Column) -> Column:
    """ISO alpha-3 -> country name via a literal map (D8,
    document_types.py:323-377)."""
    pairs: list[Column] = []
    for code, name in rules.COUNTRY_CODES.items():
        pairs.append(F.lit(code))
        pairs.append(F.lit(name))
    return F.create_map(*pairs)[country_code]


def with_doc_type(df: DataFrame, prefix: str = "") -> DataFrame:
    """Append the ``doc_type`` struct column (precompute inputs, build
    the cascade, drop the temps)."""
    return (
        with_detection_inputs(df, prefix)
        .withColumn("doc_type", doc_type_expr(prefix))
        .drop(*_TMP)
    )
