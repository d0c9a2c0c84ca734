"""Fake/specimen document detection (operators F1-F6 + F-agg,
SURVEY.md §2.4) as pure column expressions.

Replicates app/services/fake_document_detector.py:123-410:
6 weighted checks summed; confidence = round(min(total/2, 1.0), 2);
is_fake = confidence >= 0.4 or total >= 0.8.

Deliberate reference-quirk decisions (SURVEY.md §7.4.5):
- the MRZ all-filler check (:381) is dead code in the reference (its
  condition is always falsy); replicated-as-spec by omission.
- reasons[] strings reproduce the reference's formats for the checks
  our tests assert on; .title()-casing of names uses initcap (equal on
  the ascii names in the rule tables).
"""

from __future__ import annotations

from functools import reduce
from operator import add, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webxtract import rules
from webxtract.schemas import FIELD_NAMES

def _empty_arr():
    return F.array().cast("array<string>")


def _maybe(cond: Column, score: float, reason: Column | str) -> tuple[Column, Column]:
    """(score_contribution, reasons_contribution) pair for one rule."""
    r = F.lit(reason) if isinstance(reason, str) else reason
    return (
        F.when(cond, F.lit(float(score))).otherwise(F.lit(0.0)),
        F.when(cond, F.array(r)).otherwise(_empty_arr()),
    )


def fake_result_expr(prefix: str = "", raw_text: Column | None = None) -> Column:
    """Build the FakeDocumentResult struct from field columns (+ optional
    raw extracted text, mirroring detect()'s raw_text param)."""
    col = lambda name: F.col(prefix + name)  # noqa: E731

    parts = [raw_text] if raw_text is not None else []
    parts += [col(n) for n in FIELD_NAMES]
    full_text = F.concat_ws(
        " ",
        F.filter(
            F.array(*parts), lambda v: v.isNotNull() & (v != F.lit(""))
        ),
    )
    text_lower = F.lower(full_text)

    scores: list[Column] = []
    reasons: list[Column] = []

    # ---- F1 specimen keywords (:210-220): count ALL matches. Cheap
    # chained-contains precheck first; the per-row keyword array is only
    # materialized for the rare rows with a hit.
    any_kw = reduce(
        or_, [text_lower.contains(k) for k in rules.SPECIMEN_KEYWORDS]
    )
    matched_kw = F.when(
        any_kw,
        F.filter(
            F.array(*[F.lit(k) for k in rules.SPECIMEN_KEYWORDS]),
            lambda k: text_lower.contains(k),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_kw = F.size(matched_kw)
    scores.append(
        F.when(n_kw > 0, F.least(n_kw.cast("double") * 0.5, F.lit(1.0))).otherwise(0.0)
    )
    reasons.append(
        F.when(
            n_kw > 0,
            F.array(
                F.concat(
                    F.lit("Specimen keyword found: "),
                    F.array_join(matched_kw, ", "),
                )
            ),
        ).otherwise(_empty_arr())
    )

    # ---- F2 fake names (:223-264)
    first = F.lower(F.trim(F.coalesce(col("first_name"), F.lit(""))))
    last = F.lower(F.trim(F.coalesce(col("last_name"), F.lit(""))))
    full = F.lower(F.trim(F.coalesce(col("full_name"), F.lit(""))))

    # first pair matching exactly OR by containment wins (loop breaks).
    # coalesce-of-whens short-circuits left-to-right with zero per-row
    # array construction.
    first_pair = F.coalesce(
        *[
            F.when(
                ((first == f) & (last == l))
                | (first.contains(f) & last.contains(l)),
                F.struct(F.lit(f).alias("f"), F.lit(l).alias("l")),
            )
            for f, l in rules.FAKE_NAME_PAIRS
        ],
        F.lit(None).cast("struct<f:string,l:string>"),
    )
    pair_exact = (first == first_pair["f"]) & (last == first_pair["l"])
    s_pair, r_pair = (
        F.when(first_pair.isNull(), F.lit(0.0))
        .when(pair_exact, F.lit(1.0))
        .otherwise(F.lit(0.7)),
        F.when(first_pair.isNull(), _empty_arr())
        .when(
            pair_exact,
            F.array(
                F.concat(
                    F.lit("Known fake name: "),
                    F.initcap(first_pair["f"]),
                    F.lit(" "),
                    F.initcap(first_pair["l"]),
                )
            ),
        )
        .otherwise(
            F.array(
                F.concat(
                    F.lit("Suspicious name pattern: contains '"),
                    first_pair["f"],
                    F.lit("' and '"),
                    first_pair["l"],
                    F.lit("'"),
                )
            )
        ),
    )
    scores.append(s_pair)
    reasons.append(r_pair)

    first_single = F.coalesce(
        *[
            F.when(
                first.contains(s) | last.contains(s) | full.contains(s), F.lit(s)
            )
            for s in rules.FAKE_SINGLE_NAMES
        ],
        F.lit(None).cast("string"),
    )
    s, r = _maybe(
        first_single.isNotNull(),
        0.8,
        F.concat(F.lit("Fake name indicator: '"), first_single, F.lit("'")),
    )
    scores.append(s)
    reasons.append(r)

    # repeated-character names (>=4 chars, <=2 distinct)
    for which, name_col in (("first", first), ("last", last)):
        clean = F.replace(name_col, F.lit(" "), F.lit(""))
        cond = (F.length(clean) >= 4) & (
            F.size(F.array_distinct(F.split(clean, ""))) <= 2
        )
        s, r = _maybe(
            cond,
            0.5,
            F.concat(
                F.lit(f"Suspicious {which} name: '"),
                name_col,
                F.lit("' (repeated characters)"),
            ),
        )
        scores.append(s)
        reasons.append(r)

    # ---- F3 fake document numbers (:267-314)
    doc_number = F.upper(F.trim(F.coalesce(col("document_number"), F.lit(""))))
    clean_num = F.regexp_replace(doc_number, r"[\s\-]", "")
    has_num = clean_num != ""

    s, r = _maybe(
        has_num & clean_num.isin(rules.KNOWN_SPECIMEN_DOC_NUMBERS),
        1.0,
        F.concat(F.lit("Known specimen document number: "), doc_number),
    )
    scores.append(s)
    reasons.append(r)

    pattern_hit = reduce(
        or_, [clean_num.rlike(f"(?i){p}") for p in rules.FAKE_DOC_NUMBER_PATTERNS]
    )
    s, r = _maybe(
        has_num & pattern_hit,
        0.8,
        F.concat(F.lit("Suspicious document number pattern: "), doc_number),
    )
    scores.append(s)
    reasons.append(r)

    # sequential-digit ratio over the cleaned digits (:291-312)
    digits = F.split(clean_num, "")
    n = F.size(digits)
    is_digits = clean_num.rlike(r"^\d+$") & (F.length(clean_num) >= 5)
    idx = F.sequence(F.lit(2), n)  # 1-based element_at positions 2..n

    def _count_steps(step: int) -> Column:
        return F.size(
            F.filter(
                idx,
                lambda i: F.element_at(digits, i).cast("int")
                == F.element_at(digits, i - 1).cast("int") + F.lit(step),
            )
        )

    seq_ratio = F.when(
        is_digits & (n > 1),
        F.greatest(_count_steps(1), _count_steps(-1)).cast("double")
        / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    scores.append(
        F.when(~is_digits, 0.0)
        .when(seq_ratio == 1.0, 0.9)
        .when(seq_ratio >= 0.7, 0.7)
        .when(seq_ratio >= 0.5, 0.5)
        .otherwise(0.0)
    )
    reasons.append(
        F.when(~is_digits | (seq_ratio < 0.5), _empty_arr())
        .when(
            seq_ratio == 1.0,
            F.array(F.concat(F.lit("Sequential document number: "), doc_number)),
        )
        .when(
            seq_ratio >= 0.7,
            F.array(
                F.concat(F.lit("Nearly sequential document number: "), doc_number)
            ),
        )
        .otherwise(
            F.array(
                F.concat(F.lit("Partially sequential document number: "), doc_number)
            )
        )
    )

    # ---- F4 suspicious dates (:317-361)
    for field_name in ("date_of_birth", "issue_date", "expiry_date"):
        dval = F.trim(F.coalesce(col(field_name), F.lit("")))
        present = dval != ""
        is_known = dval.isin(rules.SUSPICIOUS_DATES)
        s, r = _maybe(
            present & is_known,
            0.6,
            F.concat(F.lit(f"Suspicious {field_name}: "), dval),
        )
        scores.append(s)
        reasons.append(r)
        if field_name == "date_of_birth":
            # year parse per :340-346 ("-" -> first part; "/" -> last part
            # if 4 chars else first part); known dates `continue` past this
            year = (
                F.when(
                    dval.contains("-"),
                    F.split(dval, "-")[0],
                )
                .when(
                    dval.contains("/"),
                    F.when(
                        F.length(F.element_at(F.split(dval, "/"), -1)) == 4,
                        F.element_at(F.split(dval, "/"), -1),
                    ).otherwise(F.split(dval, "/")[0]),
                )
                .otherwise(F.lit(None))
                .cast("int")
            )
            checkable = present & ~is_known & year.isNotNull()
            s, r = _maybe(
                checkable & year.isin(rules.SUSPICIOUS_BIRTH_YEARS),
                0.4,
                F.concat(F.lit("Suspicious birth year: "), year.cast("string")),
            )
            scores.append(s)
            reasons.append(r)
            s, r = _maybe(
                checkable & (year < 1920),
                0.5,
                F.concat(F.lit("Unrealistic birth year: "), year.cast("string")),
            )
            scores.append(s)
            reasons.append(r)

    # ---- F5 MRZ anomalies (:364-391)
    mrz_upper = F.upper(F.coalesce(col("mrz"), F.lit("")))
    has_mrz = mrz_upper != ""
    s, r = _maybe(
        has_mrz & (mrz_upper.contains("SPECIMEN") | mrz_upper.contains("SAMPLE")),
        1.0,
        "MRZ contains SPECIMEN/SAMPLE text",
    )
    scores.append(s)
    reasons.append(r)
    # (:381) all-filler check is dead code in the reference — omitted.
    s, r = _maybe(
        has_mrz & (mrz_upper.contains("DOEDOE") | mrz_upper.contains("JOHNJOHN")),
        0.7,
        "MRZ contains repeated name patterns",
    )
    scores.append(s)
    reasons.append(r)

    # ---- F6 fake addresses (:394-410): first matching pattern only
    addr = F.lower(F.trim(F.coalesce(col("address"), F.lit(""))))
    first_addr = F.coalesce(
        *[
            F.when(addr.contains(a), F.lit(a))
            for a in rules.FAKE_ADDRESS_PATTERNS
        ],
        F.lit(None).cast("string"),
    )
    s, r = _maybe(
        (addr != "") & first_addr.isNotNull(),
        0.8,
        F.concat(F.lit("Fake address pattern: '"), first_addr, F.lit("'")),
    )
    scores.append(s)
    reasons.append(r)

    # ---- F-agg (:184-198)
    total = reduce(add, scores)
    confidence = F.round(F.least(total / 2.0, F.lit(1.0)), 2)
    is_fake = (confidence >= 0.4) | (total >= 0.8)

    return F.struct(
        is_fake.alias("is_fake"),
        confidence.alias("confidence"),
        F.flatten(F.array(*reasons)).alias("reasons"),
        F.array(
            *[
                F.lit(c)
                for c in (
                    "specimen_keywords",
                    "fake_names",
                    "fake_document_numbers",
                    "suspicious_dates",
                    "mrz_anomalies",
                    "fake_addresses",
                )
            ]
        ).alias("checks_performed"),
    )


def with_fake_detection(
    df: DataFrame, prefix: str = "", raw_text_col: str | None = None
) -> DataFrame:
    raw = F.col(raw_text_col) if raw_text_col else None
    return df.withColumn("fake_detection", fake_result_expr(prefix, raw))
