"""The validation battery (operators V1-V46 + V-agg, SURVEY.md §2.5) as
generated Catalyst column expressions.

The reference runs 5 base validators + 1 type-specific validator per
document on a thread pool (validation_service.py:306-327); here each
validator is an independent column expression and the whole battery is
one codegen'd projection — parallelism is across rows, not checks.

Plan-size discipline (the round-1 lesson — a 34 MiB serialized task and
minutes of janino compile): the 15 provincial/state DL validators and
the 10 national passport validators are NOT inlined per type. Each
family is ONE parametrized expression whose constants come from a
*literal array of config structs*; the per-document config is selected
with ``filter(cfg_array, c -> c.name == doc_type_enum)`` and bound via
a ``transform`` lambda, so the plan carries exactly one copy of each
family's logic plus a constant-folded rule table. Non-matching rows
never evaluate the lambda (empty filter result), so dispatch cost is
data-dependent exactly like the reference's dispatch map
(validation_service.py:129-239).

Statuses (passed/failed/warning/skipped), skip conditions, thresholds
and check order replicate the reference exactly; message strings are
representative (same shape, not byte-audited). The Verifik external
lookup runs in its disabled default (config.py:7 VERIFIK_API_ENABLED=
false), surfaced as details.verifik_api_enabled=false on the ON/BC DL
results (ontario_dl.py:223-226, bc_dl.py:244-248) — it changes no
status.

Date handling: the 27-format tolerant parser (validators/base.py:56-98)
becomes an ordered coalesce of try_to_date; "now" is the frozen
``run_date`` job parameter (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from webxtract.rules import COUNTRY_CODES, DATE_FORMATS_SPARK


def _empty_arr():
    return F.array().cast("array<string>")


def _empty_map():
    return F.map_from_arrays(_empty_arr(), _empty_arr())


# ---------------------------------------------------- literal-struct helpers


def _lit_s(v) -> Column:  # noqa: ANN001
    return F.lit(v) if v is not None else F.lit(None).cast("string")


def _lit_i(v) -> Column:  # noqa: ANN001
    return F.lit(int(v)) if v is not None else F.lit(None).cast("int")


def _lit_d(v) -> Column:  # noqa: ANN001
    return F.lit(float(v)) if v is not None else F.lit(None).cast("double")


def _lit_b(v) -> Column:  # noqa: ANN001
    return F.lit(bool(v))


def _pick(arr: Column, build) -> Column:  # noqa: ANN001
    """Bind the (0- or 1-element) config array via a transform lambda and
    build the result; NULL when the array is empty. The lambda variable is
    bound once, so ``build``'s expression tree appears exactly once in the
    plan regardless of how many configs exist."""
    return F.try_element_at(F.transform(arr, build), F.lit(1))


# ------------------------------------------------------------- primitives


def parse_date_expr(col: Column) -> Column:
    """Ordered try-in-order date parse (base.py:56-98). The format order,
    incl. dd/MM/yyyy before MM/dd/yyyy, is load-bearing. The reference's
    final title-case retry is approximated with an initcap(lower())
    variant (covers space-separated month-name forms)."""
    raw = F.trim(col)
    attempts = [F.try_to_date(raw, fmt) for fmt in DATE_FORMATS_SPARK]
    attempts += [
        F.try_to_date(F.initcap(F.lower(raw)), fmt)
        for fmt in DATE_FORMATS_SPARK
        if "MMM" in fmt
    ]
    return F.coalesce(*attempts)


def _age_expr(ref: Column, dob: Column) -> Column:
    """Exact reference age algorithm (age_validator.py:36-38):
    year diff minus (month, day) tuple comparison — NOT months_between."""
    tuple_lt = (F.month(ref) < F.month(dob)) | (
        (F.month(ref) == F.month(dob)) & (F.dayofmonth(ref) < F.dayofmonth(dob))
    )
    return F.year(ref) - F.year(dob) - F.when(tuple_lt, 1).otherwise(0)


def _blank(col: Column) -> Column:
    return col.isNull() | (F.trim(col) == F.lit(""))


def _iw(cond: Column, msg: Column | str) -> Column:
    """Conditional singleton message array."""
    m = F.lit(msg) if isinstance(msg, str) else msg
    return F.when(cond, F.array(m)).otherwise(_empty_arr())


def _result(name: str | Column, issues: list[Column], warnings: list[Column],
            fail_msg: str | Column, warn_msg: str | Column, pass_msg: str | Column,
            skip_cond: Column | None = None, skip_msg: str = "",
            details: Column | None = None) -> Column:
    """Assemble a ValidatorResult struct with the reference's
    FAILED > WARNING > PASSED precedence (e.g. ontario_dl.py:231-258).
    The issue/warning arrays are bound once (status + message both read
    them; unbound they would be evaluated twice per row)."""
    from webxtract.exprs import bind_once

    def _c(v):  # noqa: ANN001
        return F.lit(v) if isinstance(v, str) else v

    iss = F.flatten(F.array(*issues)) if issues else _empty_arr()
    wrn = F.flatten(F.array(*warnings)) if warnings else _empty_arr()

    def build(p: Column) -> Column:
        pi, pw = p["iss"], p["wrn"]
        status = (
            F.when(F.size(pi) > 0, "failed")
            .when(F.size(pw) > 0, "warning")
            .otherwise("passed")
        )
        message = (
            F.when(F.size(pi) > 0, F.concat(_c(fail_msg), F.lit(": "), F.array_join(pi, "; ")))
            .when(F.size(pw) > 0, F.concat(_c(warn_msg), F.lit(": "), F.array_join(pw, "; ")))
            .otherwise(_c(pass_msg))
        )
        if skip_cond is not None:
            status = F.when(skip_cond, "skipped").otherwise(status)
            message = F.when(skip_cond, F.lit(skip_msg)).otherwise(message)
        return F.struct(
            _c(name).alias("validator_name"),
            status.alias("status"),
            message.alias("message"),
            (details if details is not None else _empty_map()).alias("details"),
        )

    return bind_once(F.struct(iss.alias("iss"), wrn.alias("wrn")), build)


def _last_name_param(variant: Column, prefix: str) -> Column:
    """The three last-name extraction variants (SURVEY.md §2.5), selected
    per row by the config's ``name_variant``:
    - "first_word": comma-part else FIRST word else last_name field
      (ontario_dl.py:28-59; also QC/MB/NS/NL)
    - "bc": comma-part else last_name field else LAST word (bc_dl.py:27-53)
    - "field_first": last_name field else comma-part else LAST word
      (california_dl.py:23-39; also TX, US)
    """
    full = F.coalesce(F.col(prefix + "full_name"), F.lit(""))
    last_field = F.trim(F.coalesce(F.col(prefix + "last_name"), F.lit("")))
    comma_part = F.trim(F.element_at(F.split(full, ",", 2), 1))
    words = F.split(F.trim(full), r"\s+")
    first_word = F.trim(F.element_at(words, 1))
    last_word = F.trim(F.element_at(words, -1))
    has_comma = full.contains(",")

    fw = (
        F.when((full != "") & has_comma & (comma_part != ""), comma_part)
        .when((full != "") & ~has_comma & (first_word != ""), first_word)
        .when(last_field != "", last_field)
        .otherwise(F.lit(""))
    )
    bc = (
        F.when((full != "") & has_comma & (comma_part != ""), comma_part)
        .when(last_field != "", last_field)
        .when((full != "") & (F.size(words) >= 2), last_word)
        .otherwise(F.lit(""))
    )
    ff = (
        F.when(last_field != "", last_field)
        .when((full != "") & has_comma, comma_part)
        .when((full != "") & (F.size(words) >= 2), last_word)
        .otherwise(F.lit(""))
    )
    return (
        F.when(variant == "first_word", fw)
        .when(variant == "bc", bc)
        .when(variant == "field_first", ff)
        .otherwise(F.lit(""))
    )


# Pre-parsed date columns: parsing the three date fields once per row and
# letting every validator reference the resulting attribute keeps the
# expression tree linear (inlining the 33-format parse at each of the
# ~60 use sites blows up plan analysis).
DOB_COL, ISSUE_COL, EXP_COL = "__dob_d", "__issue_d", "__exp_d"


@lru_cache(maxsize=4)
def _parsed_date_exprs(prefix: str) -> dict:
    return {
        DOB_COL: parse_date_expr(F.col(prefix + "date_of_birth")),
        ISSUE_COL: parse_date_expr(F.col(prefix + "issue_date")),
        EXP_COL: parse_date_expr(F.col(prefix + "expiry_date")),
    }


def with_parsed_dates(df, prefix: str = ""):
    return df.withColumns(_parsed_date_exprs(prefix))


def _dates():
    return F.col(DOB_COL), F.col(ISSUE_COL), F.col(EXP_COL)


# ------------------------------------------------------------- base five


def data_consistency_validator(run_date: Column, prefix: str = "") -> Column:
    """V1 (validators/data_consistency.py:13-72)."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    skip = _blank(col("date_of_birth")) | _blank(col("expiry_date"))
    dob, issue, exp = _dates()
    age = F.floor(F.datediff(run_date, dob) / 365)
    validity = F.floor(F.datediff(exp, issue) / 365)
    issues = [
        _iw(dob.isNotNull() & issue.isNotNull() & (dob >= issue),
            "Date of birth is not before issue date"),
        _iw(issue.isNotNull() & exp.isNotNull() & (issue >= exp),
            "Issue date is not before expiry date"),
        _iw(dob.isNotNull() & ((age > 150) | (age < 0)),
            F.concat(F.lit("Unrealistic age calculated: "), age.cast("string"), F.lit(" years"))),
        _iw(issue.isNotNull() & exp.isNotNull() & (validity > 50),
            F.concat(F.lit("Unusual document validity period: "), validity.cast("string"), F.lit(" years"))),
    ]
    return _result(
        "data_consistency", issues, [],
        "Data consistency issues found", "",
        "All date relationships are consistent",
        skip_cond=skip, skip_msg="Required fields missing",
    )


def document_expiry_validator(run_date: Column, prefix: str = "") -> Column:
    """V2 (validators/document_expiry.py:13-64)."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    skip = _blank(col("expiry_date"))
    _dob_u, _issue_u, exp = _dates()
    days = F.datediff(exp, run_date)
    issues = [_iw(exp.isNotNull() & (days < 0),
                  F.concat(F.lit("Document expired "), F.abs(days).cast("string"), F.lit(" days ago")))]
    warnings = [
        _iw(exp.isNull(), "Could not parse expiry date format"),
        _iw(exp.isNotNull() & (days >= 0) & (days < 30),
            F.concat(F.lit("Document expires in "), days.cast("string"), F.lit(" days"))),
    ]
    return _result(
        "document_expiry", issues, warnings,
        "Document expiry check failed", "Document expiry warning",
        "Document is valid",
        skip_cond=skip, skip_msg="Required fields missing: expiry_date",
    )


def age_validator(run_date: Column, minimum_age: int, prefix: str = "") -> Column:
    """V3 (validators/age_validator.py:16-60) — warn (not fail) under min."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    skip = _blank(col("date_of_birth"))
    dob, _issue_u, _exp_u = _dates()
    age = _age_expr(run_date, dob)
    warnings = [
        _iw(dob.isNull(), "Could not parse date of birth format"),
        _iw(dob.isNotNull() & (age < minimum_age),
            F.concat(F.lit("Person is "), age.cast("string"),
                     F.lit(f" years old, minimum required is {minimum_age}"))),
    ]
    return _result(
        "age_validation", [], warnings,
        "", "Age warning", "Age verification passed",
        skip_cond=skip, skip_msg="Required fields missing: date_of_birth",
    )


# 18 named patterns (validators/document_format.py:14-38)
DOCUMENT_FORMAT_PATTERNS = [
    ("CA_ONTARIO_DL", r"^[A-Z]\d{4}-?\d{5}-?\d{5}$"),
    ("CA_BC_DL", r"^(DL:?)?\d{6,7}$"),
    ("CA_ALBERTA_DL", r"^\d{6}-?\d{3}$"),
    ("CA_QUEBEC_DL", r"^[A-Z]\d{12}$"),
    ("CA_MANITOBA_DL", r"^[A-Z]{4}\d{6}$"),
    ("CA_PASSPORT", r"^[A-Z]{2}\d{6}$"),
    ("US_PASSPORT", r"^[A-Z]\d{8}$"),
    ("US_DL_CALIFORNIA", r"^[A-Z]\d{7}$"),
    ("US_DL_TEXAS", r"^\d{8}$"),
    ("US_DL_FLORIDA", r"^[A-Z]\d{12}$"),
    ("US_DL_NEW_YORK", r"^\d{9}$"),
    ("US_DL_OHIO", r"^[A-Z]{2}\d{6}$"),
    ("US_DRIVERS_LICENSE", r"^[A-Z]{1,2}\d{6,14}$"),
    ("UK_PASSPORT", r"^\d{9}$"),
    ("UK_DRIVERS_LICENSE", r"^[A-Z]{5}\d{6}[A-Z]{2}\d{2}$"),
    ("EU_ID", r"^[A-Z]{2}\d{7}$"),
    ("GENERIC_NUMERIC", r"^\d{6,12}$"),
    ("GENERIC_ALPHANUMERIC", r"^[A-Z0-9]{6,15}$"),
]


def document_format_validator(prefix: str = "") -> Column:
    """V4 (validators/document_format.py:40-82): PASS if any of the 18
    patterns match raw or dash-stripped number, else WARN. The pattern
    table is a constant-folded literal array — one exists() in the plan,
    not 36 inlined rlikes."""
    from webxtract.exprs import bind_once

    col = lambda n: F.col(prefix + n)  # noqa: E731
    skip = _blank(col("document_number"))
    raw_e = F.upper(F.trim(F.coalesce(col("document_number"), F.lit(""))))
    patterns = F.array(*[F.lit(p) for _, p in DOCUMENT_FORMAT_PATTERNS])
    # bind (raw, clean) once — the exists() lambda would otherwise
    # re-evaluate both per pattern element
    any_match = bind_once(
        F.struct(
            raw_e.alias("raw"),
            F.regexp_replace(raw_e, r"[\s\-]", "").alias("clean"),
        ),
        lambda v: F.exists(
            patterns,
            lambda p: F.regexp_like(v["raw"], p) | F.regexp_like(v["clean"], p),
        ),
    )
    warnings = [_iw(~any_match, "Document number does not match common formats")]
    return _result(
        "document_format", [], warnings,
        "", "Document format warning",
        "Document number matches known format(s)",
        skip_cond=skip, skip_msg="Required fields missing: document_number",
    )


def face_matching_validator() -> Column:
    """V5 (validators/face_matching.py:18-49): always SKIPPED (no selfie)."""
    return F.struct(
        F.lit("face_matching").alias("validator_name"),
        F.lit("skipped").alias("status"),
        F.lit("Face matching skipped - no selfie provided").alias("message"),
        _empty_map().alias("details"),
    )


# -------------------------------------------------------- DL family (V10-23, V44-45)


@dataclass
class DLConfig:
    """Declarative knobs distilled from the per-province validators —
    the files differ only in these constants (e.g. nwt_dl.py vs
    nunavut_dl.py vs yukon_dl.py)."""

    name: str
    display: str
    format_pattern: str
    near_miss: str | None          # "digits:lo:hi" | "len:N:alpha" | "len:N" | None
    fail_age: int
    warn_age_tiers: tuple[int, ...]          # ascending warn thresholds
    name_variant: str | None = None          # first_word | bc | field_first
    first_letter: str | None = None          # "fail" | "warn" | None
    ns_prefix: bool = False
    validity_low: float | None = 1.5
    validity_high: float | None = 6.0
    validity_div: float = 365.25
    expired_check: bool = True
    expiry_warn_60: bool = False             # CA/TX second tier
    issue_check_min_age: int | None = None
    ontario_dob_encoding: bool = False
    bc_prefix_strip: bool = False
    strip_slash: bool = False                # Manitoba strips "/" too
    verifik: bool = False                    # ON/BC registry lookup (disabled path)


DL_CONFIGS: dict[str, DLConfig] = {
    "ontario_drivers_license": DLConfig(
        "ontario_drivers_license", "Ontario DL", r"^[A-Z]\d{4}-\d{5}-\d{5}$",
        "len:15:alpha", 16, (18,), name_variant="first_word",
        first_letter="fail", validity_low=None, validity_high=6.0,
        validity_div=365.0, expired_check=False, issue_check_min_age=None,
        ontario_dob_encoding=True, verifik=True,
    ),
    "bc_drivers_license": DLConfig(
        "bc_drivers_license", "BC DL", r"^\d{6,7}$", "digits:5:8",
        16, (17, 19), name_variant="bc", issue_check_min_age=16,
        bc_prefix_strip=True, verifik=True,
    ),
    "alberta_drivers_license": DLConfig(
        "alberta_drivers_license", "Alberta DL", r"^\d{9}$", "digits:8:10",
        14, (16, 18), issue_check_min_age=14,
    ),
    "quebec_drivers_license": DLConfig(
        "quebec_drivers_license", "Quebec DL", r"^[A-Z]\d{12}$", "len:13:alpha",
        16, (18,), name_variant="first_word", first_letter="fail",
        validity_low=3.5, validity_high=8.5, issue_check_min_age=16,
    ),
    "manitoba_drivers_license": DLConfig(
        "manitoba_drivers_license", "Manitoba DL", r"^\d{9}$", "digits:7:10",
        16, (18,), issue_check_min_age=16, strip_slash=True,
    ),
    "saskatchewan_drivers_license": DLConfig(
        "saskatchewan_drivers_license", "Saskatchewan DL", r"^\d{8}$",
        "digits:7:9", 16, (18,), issue_check_min_age=16,
    ),
    "nova_scotia_drivers_license": DLConfig(
        "nova_scotia_drivers_license", "Nova Scotia DL", r"^[A-Z]{5}\d{9}$",
        "len:14", 16, (18,), name_variant="first_word", ns_prefix=True,
        issue_check_min_age=16,
    ),
    "new_brunswick_drivers_license": DLConfig(
        "new_brunswick_drivers_license", "New Brunswick DL", r"^\d{7}$",
        "digits:6:8", 16, (18,), validity_high=5.0, issue_check_min_age=16,
    ),
    "pei_drivers_license": DLConfig(
        "pei_drivers_license", "PEI DL", r"^\d{1,6}$", "digits:1:8",
        16, (17,), validity_low=1.0, issue_check_min_age=16,
    ),
    "newfoundland_drivers_license": DLConfig(
        "newfoundland_drivers_license", "Newfoundland DL", r"^[A-Z]\d{9}$",
        "len:10:alpha", 16, (18,), name_variant="first_word",
        first_letter="fail", validity_high=5.0, issue_check_min_age=16,
    ),
    "nwt_drivers_license": DLConfig(
        "nwt_drivers_license", "NWT DL", r"^\d{6}$", "digits:5:7",
        15, (16, 18), issue_check_min_age=15,
    ),
    "nunavut_drivers_license": DLConfig(
        "nunavut_drivers_license", "Nunavut DL", r"^\d{6}$", "digits:5:7",
        15, (16, 18), issue_check_min_age=15,
    ),
    "yukon_drivers_license": DLConfig(
        "yukon_drivers_license", "Yukon DL", r"^\d{6}$", "digits:5:7",
        15, (16, 18), issue_check_min_age=15,
    ),
    "california_drivers_license": DLConfig(
        "california_drivers_license", "California DL", r"^[A-Z]\d{7}$", None,
        16, (18,), name_variant="field_first", first_letter="warn",
        validity_low=4.0, validity_high=6.0, expiry_warn_60=True,
        issue_check_min_age=None,
    ),
    "texas_drivers_license": DLConfig(
        "texas_drivers_license", "Texas DL", r"^\d{8}$", None,
        16, (18,), name_variant="field_first",
        validity_low=5.0, validity_high=8.5, expiry_warn_60=True,
        issue_check_min_age=None,
    ),
}


def _parse_near(spec: str | None) -> tuple[str | None, int | None, int | None]:
    if spec is None:
        return None, None, None
    parts = spec.split(":")
    if parts[0] == "digits":
        return "digits", int(parts[1]), int(parts[2])
    if parts[0] == "len" and len(parts) == 3:
        return "len_alpha", int(parts[1]), None
    return "len", int(parts[1]), None


def _dl_cfg_struct(c: DLConfig) -> Column:
    kind, lo, hi = _parse_near(c.near_miss)
    tiers = list(c.warn_age_tiers)
    return F.struct(
        _lit_s(c.name).alias("name"),
        _lit_s(c.display).alias("display"),
        _lit_s(c.format_pattern).alias("fmt"),
        _lit_s(kind).alias("near_kind"),
        _lit_i(lo).alias("near_lo"),
        _lit_i(hi).alias("near_hi"),
        _lit_i(c.fail_age).alias("fail_age"),
        _lit_i(tiers[0] if tiers else None).alias("tier1"),
        _lit_i(tiers[1] if len(tiers) > 1 else None).alias("tier2"),
        _lit_s(c.name_variant).alias("name_variant"),
        _lit_s(c.first_letter).alias("first_letter"),
        _lit_b(c.ns_prefix).alias("ns_prefix"),
        _lit_d(c.validity_low).alias("validity_low"),
        _lit_d(c.validity_high).alias("validity_high"),
        _lit_d(c.validity_div).alias("validity_div"),
        _lit_b(c.expired_check).alias("expired_check"),
        _lit_b(c.expiry_warn_60).alias("expiry_warn_60"),
        _lit_i(c.issue_check_min_age).alias("issue_min"),
        _lit_b(c.ontario_dob_encoding).alias("ont_dob"),
        _lit_b(c.bc_prefix_strip).alias("bc_strip"),
        _lit_b(c.strip_slash).alias("strip_slash"),
        _lit_b(c.verifik).alias("verifik"),
    )


def _dl_cfg_array() -> Column:
    return F.array(*[_dl_cfg_struct(c) for c in DL_CONFIGS.values()])


def _dl_result(cfg: Column, run_date: Column, prefix: str = "") -> Column:
    """One parametrized DL validator over a bound config struct — the
    single-copy form of the 15 per-province validators (SURVEY.md §2.5
    V10-V23/V44-V45; the per-file logic differs only in the constants
    carried by ``cfg``). The derived per-row values (cleaned number,
    extracted last name, ages, validity, days-to-expiry) are bound once
    and referenced as lambda variables."""
    from webxtract.exprs import bind_once

    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw_e = F.upper(F.trim(F.coalesce(col("document_number"), F.lit(""))))

    # NDL:/NDL/DL:/DL prefix strip for BC (bc_dl.py:74-96); Manitoba also
    # strips "/" (manitoba_dl.py:70-76); default strips spaces/dashes.
    bc_clean = (
        F.when(raw_e.startswith("NDL:"), F.trim(F.substring(raw_e, 5, 100)))
        .when(raw_e.startswith("NDL"), F.trim(F.substring(raw_e, 4, 100)))
        .when(raw_e.startswith("DL:"), F.trim(F.substring(raw_e, 4, 100)))
        .when(raw_e.startswith("DL"), F.trim(F.substring(raw_e, 3, 100)))
        .otherwise(F.regexp_replace(raw_e, r"[\s\-]", ""))
    )
    clean_e = (
        F.when(cfg["bc_strip"], bc_clean)
        .when(cfg["strip_slash"], F.regexp_replace(raw_e, r"[\s\-/]", ""))
        .otherwise(F.regexp_replace(raw_e, r"[\s\-]", ""))
    )
    dob_e, issue_e, exp_e = _dates()
    derived = F.struct(
        raw_e.alias("raw"),
        clean_e.alias("clean"),
        _last_name_param(cfg["name_variant"], prefix).alias("last_name"),
        _age_expr(run_date, dob_e).alias("age"),
        _age_expr(issue_e, dob_e).alias("age_at_issue"),
        (F.datediff(exp_e, issue_e) / cfg["validity_div"]).alias("validity"),
        F.datediff(exp_e, run_date).alias("days"),
    )
    return bind_once(derived, lambda v: _dl_body(cfg, v, run_date, prefix))


def _dl_body(cfg: Column, v: Column, run_date: Column, prefix: str) -> Column:
    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw, clean = v["raw"], v["clean"]

    issues: list[Column] = []
    warnings: list[Column] = []

    # check 1: number format. The pattern is evaluated against the raw
    # upper-trimmed number AND the stripped one — the Ontario pattern
    # requires its hyphens (ontario_dl.py:79 matches the un-stripped
    # number), every other config's digits-only pattern matches the
    # stripped form; a raw match is never spurious because only the
    # Ontario pattern contains separators.
    fmt_ok = F.regexp_like(raw, cfg["fmt"]) | F.regexp_like(clean, cfg["fmt"])
    near = (
        F.when(
            cfg["near_kind"] == "digits",
            clean.rlike(r"^\d+$")
            & (F.length(clean) >= cfg["near_lo"])
            & (F.length(clean) <= cfg["near_hi"]),
        )
        .when(
            cfg["near_kind"] == "len_alpha",
            (F.length(clean) == cfg["near_lo"])
            & F.substring(clean, 1, 1).rlike("[A-Z]"),
        )
        .when(cfg["near_kind"] == "len", F.length(clean) == cfg["near_lo"])
        .otherwise(F.lit(False))
    )
    issues.append(_iw(clean == "", "Missing licence number"))
    issues.append(
        _iw((clean != "") & ~fmt_ok & ~near,
            F.concat(F.lit("Invalid "), cfg["display"], F.lit(" format. Got: "), raw))
    )
    warnings.append(
        _iw((clean != "") & ~fmt_ok & near,
            F.concat(F.lit("Licence number may have format issues: "), raw))
    )

    # first-letter / NS-prefix name checks
    last_name = v["last_name"]
    letter = F.substring(clean, 1, 1)
    has_fl = cfg["first_letter"].isNotNull()
    cond_mismatch = (
        has_fl
        & (clean != "")
        & letter.rlike("[A-Z]")
        & (last_name != "")
        & (letter != F.upper(F.substring(last_name, 1, 1)))
    )
    cond_noname = has_fl & (clean != "") & letter.rlike("[A-Z]") & (last_name == "")
    fl_msg = F.concat(
        F.lit("Licence first letter '"), letter,
        F.lit("' does not match last name initial '"),
        F.upper(F.substring(last_name, 1, 1)), F.lit("'"),
    )
    issues.append(_iw(cond_mismatch & (cfg["first_letter"] == "fail"), fl_msg))
    warnings.append(_iw(cond_mismatch & (cfg["first_letter"] == "warn"), fl_msg))
    warnings.append(
        _iw(cond_noname, F.concat(
            F.lit("Cannot verify licence letter '"), letter,
            F.lit("' - no last name found")))
    )
    # surname -> 5-letter X-padded prefix; warn on first-letter mismatch
    # only (nova_scotia_dl.py:51-60,106-120)
    ln_clean = F.regexp_replace(F.upper(last_name), "[^A-Z]", "")
    expected = F.rpad(F.substring(ln_clean, 1, 5), 5, "X")
    warnings.append(
        _iw(
            cfg["ns_prefix"] & (clean != "") & (F.length(clean) >= 5)
            & (last_name != "")
            & (F.substring(clean, 1, 1) != F.substring(expected, 1, 1)),
            F.concat(F.lit("Licence prefix '"), F.substring(clean, 1, 5),
                     F.lit("' may not match surname '"), last_name, F.lit("'")),
        )
    )

    # minimum-age tiers
    dob, issue_d, exp = _dates()
    age = v["age"]
    has_dob = dob.isNotNull()
    issues.append(
        _iw(has_dob & (age < cfg["fail_age"]),
            F.concat(F.lit("Person is "), age.cast("string"),
                     F.lit(" years old. "), cfg["display"],
                     F.lit(" requires minimum "), cfg["fail_age"].cast("string")))
    )
    warnings.append(
        _iw(cfg["tier1"].isNotNull() & has_dob
            & (age >= cfg["fail_age"]) & (age < cfg["tier1"]),
            F.concat(F.lit("Person is "), age.cast("string"),
                     F.lit(". Licence-class restrictions may apply (under "),
                     cfg["tier1"].cast("string"), F.lit(")")))
    )
    warnings.append(
        _iw(cfg["tier2"].isNotNull() & has_dob
            & (age >= cfg["tier1"]) & (age < cfg["tier2"]),
            F.concat(F.lit("Person is "), age.cast("string"),
                     F.lit(". Licence-class restrictions may apply (under "),
                     cfg["tier2"].cast("string"), F.lit(")")))
    )

    # expiry-on-birthday (warn)
    warnings.append(
        _iw(
            has_dob & exp.isNotNull()
            & ((F.month(dob) != F.month(exp)) | (F.dayofmonth(dob) != F.dayofmonth(exp))),
            F.concat(F.lit("Expiry date is not on birthday. "), cfg["display"],
                     F.lit(" typically expires on holder's birthday")),
        )
    )

    # validity window (warn)
    validity = v["validity"]
    has_validity = issue_d.isNotNull() & exp.isNotNull()
    warnings.append(
        _iw(cfg["validity_low"].isNotNull() & has_validity
            & (validity < cfg["validity_low"]),
            F.concat(F.lit("Short validity period (under "),
                     cfg["validity_low"].cast("string"), F.lit(" years)")))
    )
    warnings.append(
        _iw(cfg["validity_high"].isNotNull() & has_validity
            & (validity > cfg["validity_high"]),
            F.concat(F.lit("Validity period exceeds typical "), cfg["display"],
                     F.lit(" term")))
    )

    # expired check
    days = v["days"]
    issues.append(
        _iw(cfg["expired_check"] & exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("Licence expired "), (-days).cast("string"), F.lit(" days ago")))
    )
    warnings.append(
        _iw(cfg["expired_check"] & exp.isNotNull() & (exp >= run_date) & (days < 30),
            F.concat(F.lit("Licence expires in "), days.cast("string"), F.lit(" days")))
    )
    warnings.append(
        _iw(cfg["expired_check"] & cfg["expiry_warn_60"] & exp.isNotNull()
            & (exp >= run_date) & (days >= 30) & (days < 60),
            F.concat(F.lit("Licence expires soon ("), days.cast("string"), F.lit(" days)")))
    )

    # issue-date sanity
    age_at_issue = v["age_at_issue"]
    has_issue_check = cfg["issue_min"].isNotNull()
    issues.append(_iw(has_issue_check & issue_d.isNotNull() & (issue_d > run_date),
                      "Issue date cannot be in the future"))
    issues.append(
        _iw(has_issue_check & issue_d.isNotNull() & has_dob & (issue_d < dob),
            "Issue date cannot be before date of birth")
    )
    issues.append(
        _iw(
            has_issue_check & issue_d.isNotNull() & has_dob & (issue_d >= dob)
            & (age_at_issue < cfg["issue_min"]),
            F.concat(F.lit("Person was "), age_at_issue.cast("string"),
                     F.lit(" at issue date. "), cfg["display"],
                     F.lit(" requires minimum "), cfg["issue_min"].cast("string"),
                     F.lit(" for any licence")),
        )
    )

    # Ontario DOB-in-number encoding (ontario_dl.py:156-202)
    no_hyphen = F.regexp_replace(clean, r"[\s\-]", "")
    last6 = F.substring(no_hyphen, -6, 6)
    yy = F.date_format(dob, "yy")
    male = F.concat(yy, F.date_format(dob, "MM"), F.date_format(dob, "dd"))
    female = F.concat(yy, F.lpad((F.month(dob) + 50).cast("string"), 2, "0"),
                      F.date_format(dob, "dd"))
    gender = F.upper(F.trim(F.coalesce(col("gender"), F.lit(""))))
    checkable = cfg["ont_dob"] & (clean != "") & has_dob
    issues.append(
        _iw(checkable & (last6 != male) & (last6 != female),
            F.concat(F.lit("Last 6 digits of licence '"), last6,
                     F.lit("' do not match DOB encoding")))
    )
    warnings.append(
        _iw(checkable & (last6 == male) & gender.isin("F", "FEMALE"),
            "License uses male DOB encoding but gender is female")
    )
    warnings.append(
        _iw(checkable & (last6 == female) & gender.isin("M", "MALE"),
            "License uses female DOB encoding (month +50) but gender is male")
    )

    # Verifik registry lookup — disabled default (config.py:7); the
    # reference attaches details.verifik_api_enabled=false when local
    # checks were clean (ontario_dl.py:204-226).
    details = F.when(
        cfg["verifik"],
        F.create_map(F.lit("verifik_api_enabled"), F.lit("false")),
    ).otherwise(_empty_map())

    return _result(
        cfg["name"], issues, warnings,
        F.concat(cfg["display"], F.lit(" validation failed")),
        F.concat(cfg["display"], F.lit(" validation passed with warnings")),
        F.concat(cfg["display"], F.lit(" validation passed")),
        details=details,
    )


def dl_validator(cfg: DLConfig, run_date: Column, prefix: str = "") -> Column:
    """Single-config convenience wrapper (tests / ad-hoc use)."""
    return _pick(
        F.array(_dl_cfg_struct(cfg)),
        lambda c: _dl_result(c, run_date, prefix),
    )


# ----------------------------------------------------- passports (V30-41)


@dataclass
class PassportConfig:
    name: str
    display: str
    country_code: str
    format_pattern: str
    near_miss: str | None          # as DLConfig, plus "france" special
    child_age: int | None          # age_at_issue threshold; None = no tiers
    child_window: tuple[float, float] | None
    adult_window: tuple[float, float] = (9.5, 10.5)
    no_age_fallback: bool = False  # warn when neither window matches
    fixed_window_only: bool = False  # colombia: adult window always
    always_window: bool = False    # nigeria: either window, no age check
    invalid_letters: str | None = None  # germany


PASSPORT_CONFIGS: dict[str, PassportConfig] = {
    "us_passport": PassportConfig(
        "us_passport", "US Passport", "USA", r"^\d{9}$", "digits:8:10",
        16, (4.5, 5.5)),
    "uk_passport": PassportConfig(
        "uk_passport", "UK Passport", "GBR", r"^\d{9}$", "digits:8:10",
        16, (4.5, 5.5)),
    "india_passport": PassportConfig(
        "india_passport", "India Passport", "IND", r"^[A-Z]\d{7}$", "len:8:alpha",
        18, (4.5, 5.5)),
    "australia_passport": PassportConfig(
        "australia_passport", "Australia Passport", "AUS", r"^[A-Z]{1,2}\d{7}$",
        "minlen:8:alpha", 16, (4.5, 5.5)),
    "germany_passport": PassportConfig(
        "germany_passport", "Germany Passport", "DEU", r"^[A-Z0-9]{9}$", None,
        24, (5.5, 6.5), invalid_letters="IOQS"),
    "france_passport": PassportConfig(
        "france_passport", "France Passport", "FRA", r"^\d{2}[A-Z]{2}\d{5}$",
        "france", 18, (4.5, 5.5)),
    "nigeria_passport": PassportConfig(
        "nigeria_passport", "Nigeria Passport", "NGA", r"^[A-Z]\d{8}$", "len:9:alpha",
        None, (4.5, 5.5), always_window=True),
    "china_passport": PassportConfig(
        "china_passport", "China Passport", "CHN", r"^[EGD]\d{8}$", "len:9:egd",
        16, (4.5, 5.5), no_age_fallback=True),
    "colombia_passport": PassportConfig(
        "colombia_passport", "Colombia Passport", "COL", r"^[A-Z]{2}\d{6,7}$",
        "len89:alpha2", None, None, fixed_window_only=True),
    "ukraine_passport": PassportConfig(
        "ukraine_passport", "Ukraine Passport", "UKR", r"^[A-Z]{2}\d{6}$",
        "len:8:alpha2", 18, (3.5, 4.5), no_age_fallback=True),
}


def _parse_pp_near(spec: str | None) -> tuple[str | None, int | None, int | None]:
    if spec is None:
        return None, None, None
    if spec == "france":
        return "france", None, None
    if spec == "len89:alpha2":
        return "len89_alpha2", None, None
    parts = spec.split(":")
    if parts[0] == "digits":
        return "digits", int(parts[1]), int(parts[2])
    if parts[0] == "minlen":
        return "minlen_alpha", int(parts[1]), None
    # len:N:egd | len:N:alpha2 | len:N:alpha
    return f"len_{parts[2]}", int(parts[1]), None


def _pp_cfg_struct(c: PassportConfig) -> Column:
    kind, lo, hi = _parse_pp_near(c.near_miss)
    c_lo, c_hi = c.child_window if c.child_window else (None, None)
    a_lo, a_hi = c.adult_window
    return F.struct(
        _lit_s(c.name).alias("name"),
        _lit_s(c.display).alias("display"),
        _lit_s(c.country_code).alias("cc"),
        _lit_s(c.format_pattern).alias("fmt"),
        _lit_s(kind).alias("near_kind"),
        _lit_i(lo).alias("near_lo"),
        _lit_i(hi).alias("near_hi"),
        _lit_i(c.child_age).alias("child_age"),
        _lit_d(c_lo).alias("child_lo"),
        _lit_d(c_hi).alias("child_hi"),
        _lit_d(a_lo).alias("adult_lo"),
        _lit_d(a_hi).alias("adult_hi"),
        _lit_b(c.no_age_fallback).alias("no_age_fallback"),
        _lit_b(c.fixed_window_only).alias("fixed_window_only"),
        _lit_b(c.always_window).alias("always_window"),
        _lit_s(c.invalid_letters).alias("inv_letters"),
    )


def _pp_cfg_array() -> Column:
    return F.array(*[_pp_cfg_struct(c) for c in PASSPORT_CONFIGS.values()])


def _pp_result(cfg: Column, run_date: Column, prefix: str = "") -> Column:
    """One parametrized national-passport validator (V31-V40) over a
    bound config struct. Derived per-row values are bound once."""
    from webxtract.exprs import bind_once

    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw_e = F.trim(F.coalesce(col("document_number"), F.lit("")))
    dob_e, issue_e, exp_e = _dates()
    derived = F.struct(
        F.upper(F.trim(F.coalesce(col("country_code"), F.lit("")))).alias("cc"),
        raw_e.alias("raw"),
        F.regexp_replace(F.upper(raw_e), r"[\s\-]", "").alias("clean"),
        _age_expr(issue_e, dob_e).alias("age_at_issue"),
        (F.datediff(exp_e, issue_e) / 365.25).alias("validity"),
        F.datediff(exp_e, run_date).alias("days"),
    )
    return bind_once(derived, lambda v: _pp_body(cfg, v, run_date, prefix))


def _pp_body(cfg: Column, v: Column, run_date: Column, prefix: str) -> Column:
    cc, raw, clean = v["cc"], v["raw"], v["clean"]

    issues: list[Column] = []
    warnings: list[Column] = []

    # country-code check -> WARNING on mismatch (us_passport.py:36-43)
    warnings.append(
        _iw((cc != "") & (cc != cfg["cc"]),
            F.concat(F.lit("Country code '"), cc,
                     F.lit("' does not match expected '"), cfg["cc"], F.lit("'")))
    )

    fmt_ok = F.regexp_like(clean, cfg["fmt"])
    near = (
        F.when(
            cfg["near_kind"] == "digits",
            clean.rlike(r"^\d+$")
            & F.length(clean).between(cfg["near_lo"], cfg["near_hi"]),
        )
        .when(cfg["near_kind"] == "france", clean.rlike(r"^[A-Z0-9]{9}$"))
        .when(
            cfg["near_kind"] == "len_egd",
            (F.length(clean) == cfg["near_lo"])
            & F.substring(clean, 1, 1).isin("E", "G", "D"),
        )
        .when(
            cfg["near_kind"] == "len89_alpha2",
            F.length(clean).isin(8, 9) & F.substring(clean, 1, 2).rlike("^[A-Z]{2}$"),
        )
        .when(
            cfg["near_kind"] == "len_alpha2",
            (F.length(clean) == cfg["near_lo"])
            & F.substring(clean, 1, 2).rlike("^[A-Z]{2}$"),
        )
        .when(
            cfg["near_kind"] == "minlen_alpha",
            (F.length(clean) >= cfg["near_lo"])
            & F.substring(clean, 1, 1).rlike("[A-Z]"),
        )
        .when(
            cfg["near_kind"] == "len_alpha",
            (F.length(clean) == cfg["near_lo"])
            & F.substring(clean, 1, 1).rlike("[A-Z]"),
        )
        .otherwise(F.lit(False))
    )
    has_inv = cfg["inv_letters"].isNotNull()
    bad = F.size(
        F.filter(F.split(clean, ""), lambda ch: F.contains(cfg["inv_letters"], ch))
    )
    issues.append(_iw(clean == "", "Missing passport number"))
    issues.append(
        _iw(has_inv & (clean != "") & fmt_ok & (bad > 0),
            F.concat(F.lit("Passport number contains invalid characters ("),
                     F.array_join(F.split(cfg["inv_letters"], ""), "/"),
                     F.lit(" not used)")))
    )
    issues.append(
        _iw(has_inv & (clean != "") & ~fmt_ok,
            F.concat(F.lit("Invalid "), cfg["display"], F.lit(" format. Got: "), raw))
    )
    issues.append(
        _iw(~has_inv & (clean != "") & ~fmt_ok & ~near,
            F.concat(F.lit("Invalid "), cfg["display"], F.lit(" format. Got: "), raw))
    )
    warnings.append(
        _iw(~has_inv & (clean != "") & ~fmt_ok & near,
            F.concat(F.lit("Passport number may have format issues: "), raw))
    )

    dob, issue_d, exp = _dates()
    age_at_issue = v["age_at_issue"]
    has_age = dob.isNotNull() & issue_d.isNotNull()

    issues.append(_iw(has_age & (issue_d < dob), "Issue date cannot be before date of birth"))

    validity = v["validity"]
    has_validity = issue_d.isNotNull() & exp.isNotNull()
    in_adult = (validity >= cfg["adult_lo"]) & (validity <= cfg["adult_hi"])
    in_child = (validity >= cfg["child_lo"]) & (validity <= cfg["child_hi"])
    warnings.append(
        _iw(cfg["fixed_window_only"] & has_validity & ~in_adult,
            F.concat(F.lit("Validity outside expected ~10 years for "), cfg["display"]))
    )
    warnings.append(
        _iw(cfg["always_window"] & has_validity & ~in_child & ~in_adult,
            F.concat(F.lit("Validity outside expected windows for "), cfg["display"]))
    )
    tiered = ~cfg["fixed_window_only"] & ~cfg["always_window"]
    warnings.append(
        _iw(tiered & has_validity & has_age
            & (age_at_issue < cfg["child_age"]) & ~in_child,
            F.concat(F.lit("Child/young passport validity outside ~"),
                     (cfg["child_hi"] - 0.5).cast("int").cast("string"),
                     F.lit("-year window")))
    )
    warnings.append(
        _iw(tiered & has_validity & has_age
            & (age_at_issue >= cfg["child_age"]) & ~in_adult,
            "Adult passport validity outside ~10-year window")
    )
    warnings.append(
        _iw(tiered & cfg["no_age_fallback"] & has_validity & ~has_age
            & ~in_child & ~in_adult,
            F.concat(F.lit("Validity outside expected windows for "), cfg["display"]))
    )

    # expiry: FAIL expired, WARN <180 days
    days = v["days"]
    issues.append(
        _iw(exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("Passport expired "), (-days).cast("string"), F.lit(" days ago")))
    )
    warnings.append(
        _iw(exp.isNotNull() & (exp >= run_date) & (days < 180),
            F.concat(F.lit("Passport expires in "), days.cast("string"),
                     F.lit(" days. Many countries require 6+ months validity")))
    )

    return _result(
        cfg["name"], issues, warnings,
        F.concat(cfg["display"], F.lit(" validation failed")),
        F.concat(cfg["display"], F.lit(" validation passed with warnings")),
        F.concat(cfg["display"], F.lit(" validation passed")),
    )


def passport_validator(cfg: PassportConfig, run_date: Column, prefix: str = "") -> Column:
    """Single-config convenience wrapper (tests / ad-hoc use)."""
    return _pick(
        F.array(_pp_cfg_struct(cfg)),
        lambda c: _pp_result(c, run_date, prefix),
    )


def canadian_passport_validator(run_date: Column, prefix: str = "") -> Column:
    """V30 (validators/canadian_passport.py): no format FAIL, validity
    tiers by age-at-issue (<16: ~5y / 16+: ~10y), >10.5y FAILS when age
    unknown, current age >120 FAILS, pre-1985 issue warns. No expiry check."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    dob, issue_d, exp = _dates()
    age_at_issue = _age_expr(issue_d, dob)
    has_age = dob.isNotNull() & issue_d.isNotNull()
    current_age = _age_expr(run_date, dob)

    validity = F.datediff(exp, issue_d) / 365.25
    has_validity = issue_d.isNotNull() & exp.isNotNull()

    issues = [
        _iw(has_age & (issue_d < dob), "Issue date cannot be before date of birth"),
        _iw(has_validity & ~has_age & (validity > 10.5),
            "Invalid validity period: Canadian passports are valid for max 10 years"),
        _iw(dob.isNotNull() & (current_age < 0), "Date of birth is in the future"),
        _iw(dob.isNotNull() & (current_age > 120),
            F.concat(F.lit("Unrealistic age: "), current_age.cast("string"), F.lit(" years"))),
        _iw(issue_d.isNotNull() & (issue_d > run_date), "Issue date cannot be in the future"),
    ]
    warnings = [
        _iw(has_validity & has_age & (age_at_issue < 16)
            & ((validity < 4.5) | (validity > 5.5)),
            "Child passport validity outside ~5-year window"),
        _iw(has_validity & has_age & (age_at_issue >= 16)
            & ((validity < 9.5) | (validity > 10.5)),
            "Adult passport validity outside ~10-year window"),
        _iw(has_validity & ~has_age & (validity < 4.5),
            "Unusual short validity period"),
        _iw(issue_d.isNotNull() & (issue_d <= run_date)
            & (issue_d < F.to_date(F.lit("1985-01-01"))),
            "Issue date predates modern passport format"),
    ]
    return _result(
        "canadian_passport", issues, warnings,
        "Canadian Passport validation failed",
        "Canadian Passport validation passed with warnings",
        "Canadian Passport validation passed",
    )


def generic_passport_validator(run_date: Column, prefix: str = "") -> Column:
    """V41 (validators/generic_passport.py)."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    cc = F.upper(F.trim(F.coalesce(col("country_code"), F.lit(""))))
    raw = F.trim(F.coalesce(col("document_number"), F.lit("")))
    clean = F.regexp_replace(F.upper(raw), r"[\s\-]", "")

    fmt_ok = clean.rlike(r"^[A-Z0-9]{6,12}$")
    dob, issue_d, exp = _dates()
    validity = F.datediff(exp, issue_d) / 365.25
    has_validity = issue_d.isNotNull() & exp.isNotNull()
    days = F.datediff(exp, run_date)

    issues = [
        _iw(clean == "", "Missing passport number"),
        _iw(dob.isNotNull() & issue_d.isNotNull() & (issue_d < dob),
            "Issue date cannot be before date of birth"),
        _iw(exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("Passport expired "), (-days).cast("string"), F.lit(" days ago"))),
    ]
    warnings = [
        _iw((cc != "") & ~cc.isin(list(COUNTRY_CODES)),
            F.concat(F.lit("Country code '"), cc,
                     F.lit("' is not a recognized ISO 3166-1 alpha-3 code"))),
        _iw(cc == "", "No country code found on passport"),
        _iw((clean != "") & ~fmt_ok & (F.length(clean) < 6),
            "Passport number seems too short"),
        _iw((clean != "") & ~fmt_ok & (F.length(clean) > 12),
            "Passport number seems too long"),
        _iw((clean != "") & ~fmt_ok & F.length(clean).between(6, 12),
            "Passport number may have format issues"),
        _iw(has_validity & (validity < 1), "Passport has very short validity"),
        _iw(has_validity & (validity > 12), "Passport has unusually long validity"),
        _iw(exp.isNotNull() & (exp >= run_date) & (days < 180),
            F.concat(F.lit("Passport expires in "), days.cast("string"),
                     F.lit(" days. Many countries require 6+ months validity"))),
    ]
    return _result(
        "generic_passport", issues, warnings,
        "International Passport validation failed",
        "International Passport validation passed with warnings",
        "International Passport validation passed",
    )


# ------------------------------------------- photo ID / PR card / OHIP / US DL


def generic_photo_id_validator(run_date: Column, prefix: str = "") -> Column:
    """V42 (validators/generic_photo_id.py) — also serves ON/BC/AB photo
    cards (validation_service.py:212-223)."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw = F.trim(F.coalesce(col("document_number"), F.lit("")))
    clean = F.regexp_replace(F.upper(raw), r"[\s\-]", "")
    dob, issue_d, exp = _dates()
    age = _age_expr(run_date, dob)
    validity = F.datediff(exp, issue_d) / 365.25
    has_validity = issue_d.isNotNull() & exp.isNotNull()
    days = F.datediff(exp, run_date)

    issues = [
        _iw(clean == "", "Missing document number"),
        _iw(dob.isNotNull() & (dob > run_date), "Date of birth cannot be in the future"),
        _iw(dob.isNotNull() & (dob <= run_date) & (age < 0), "Invalid date of birth"),
        _iw(issue_d.isNotNull() & (issue_d > run_date), "Issue date cannot be in the future"),
        _iw(issue_d.isNotNull() & (issue_d <= run_date) & dob.isNotNull() & (issue_d < dob),
            "Issue date cannot be before date of birth"),
        _iw(exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("Photo ID expired "), (-days).cast("string"), F.lit(" days ago"))),
    ]
    warnings = [
        _iw((clean != "") & (F.length(clean) < 4), "Document number seems too short"),
        _iw(exp.isNotNull() & (exp >= run_date) & (days < 30),
            F.concat(F.lit("Photo ID expires in "), days.cast("string"), F.lit(" days"))),
        _iw(has_validity & (validity < 1), "Photo ID has very short validity"),
        _iw(has_validity & (validity > 10), "Photo ID has unusually long validity"),
    ]
    return _result(
        "generic_photo_id", issues, warnings,
        "Photo ID validation failed",
        "Photo ID validation passed with warnings",
        "Photo ID validation passed",
    )


def canada_pr_card_validator(run_date: Column, prefix: str = "") -> Column:
    """V43 (validators/canada_pr_card.py): format warn-only, under-18
    warn, expiry warn tiers 180/365, validity ~5y window 4-6."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw = F.trim(F.coalesce(col("document_number"), F.lit("")))
    clean = F.regexp_replace(F.upper(raw), r"[\s\-]", "")
    dob, issue_d, exp = _dates()
    age = _age_expr(run_date, dob)
    validity = F.datediff(exp, issue_d) / 365.25
    has_validity = issue_d.isNotNull() & exp.isNotNull()
    days = F.datediff(exp, run_date)

    issues = [
        _iw(clean == "", "Missing document number"),
        _iw(dob.isNotNull() & (dob > run_date), "Date of birth cannot be in the future"),
        _iw(dob.isNotNull() & (dob <= run_date) & (age < 0), "Invalid date of birth"),
        _iw(issue_d.isNotNull() & (issue_d > run_date), "Issue date cannot be in the future"),
        _iw(issue_d.isNotNull() & (issue_d <= run_date) & dob.isNotNull() & (issue_d < dob),
            "Issue date cannot be before date of birth"),
        _iw(exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("PR Card expired "), (-days).cast("string"), F.lit(" days ago"))),
    ]
    warnings = [
        _iw((clean != "") & ~clean.rlike(r"^[A-Z]{2}\d{6}$"),
            F.concat(F.lit("Document number '"), raw,
                     F.lit("' does not match expected PR Card format (2 letters + 6 digits)"))),
        _iw(dob.isNotNull() & (dob <= run_date) & (age >= 0) & (age < 18),
            F.concat(F.lit("Holder is under 18 years old (age: "), age.cast("string"), F.lit(")"))),
        _iw(exp.isNotNull() & (exp >= run_date) & (days < 180),
            F.concat(F.lit("PR Card expires in "), days.cast("string"),
                     F.lit(" days - renewal recommended"))),
        _iw(exp.isNotNull() & (exp >= run_date) & (days >= 180) & (days < 365),
            F.concat(F.lit("PR Card expires in "), days.cast("string"), F.lit(" days"))),
        _iw(has_validity & (validity < 4), "PR Card has shorter than expected validity (~5 years)"),
        _iw(has_validity & (validity > 6), "PR Card has longer than expected validity"),
    ]
    return _result(
        "canada_pr_card", issues, warnings,
        "PR Card validation failed",
        "PR Card validation passed with warnings",
        "PR Card validation passed",
    )


def _luhn_valid_expr(digits: Column) -> Column:
    """Luhn mod-10 over a digit string (ontario_health_card.py:28-59),
    as a higher-order aggregate: double every second digit from the
    right, subtract 9 when >9, sum, mod 10 == 0."""
    n = F.length(digits)
    arr = F.split(digits, "")
    # position from right (0-indexed) = n - i for 1-based element i
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            ((n - i) % 2) == 1,
            F.when(
                F.element_at(arr, i).cast("int") * 2 > 9,
                F.element_at(arr, i).cast("int") * 2 - 9,
            ).otherwise(F.element_at(arr, i).cast("int") * 2),
        ).otherwise(F.element_at(arr, i).cast("int")),
    )
    return (total % 10) == 0


def ontario_health_card_validator(run_date: Column, prefix: str = "") -> Column:
    """V11 (validators/ontario_health_card.py): 10 digits + 2-letter
    version code, Luhn checksum FAIL, version letters not in {I,O,Q,U},
    expired FAIL / <90d warn, DOB-not-future, no-version-code warns."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    raw = F.trim(F.coalesce(col("document_number"), F.lit("")))
    clean = F.regexp_replace(F.upper(raw), r"[\s\-]", "")
    digits = F.regexp_replace(clean, r"[^0-9]", "")
    letters = F.regexp_replace(clean, r"[^A-Z]", "")
    is_valid_format = (
        clean.rlike(r"^\d{10}[A-Z]{2}$")
        | clean.rlike(r"^\d{10}$")
        | ((F.length(digits) == 10) & F.length(letters).isin(0, 2))
    )
    health_number = F.when(F.length(digits) == 10, digits).otherwise(F.lit(""))
    version = F.when(F.length(letters) == 2, letters).otherwise(F.lit(""))
    luhn_ok = _luhn_valid_expr(health_number)
    has_bad_version_letter = (
        F.size(F.filter(F.split(version, ""), lambda c: c.isin("I", "O", "Q", "U"))) > 0
    )
    dob = parse_date_expr(col("date_of_birth"))
    _dob_u, _issue_u, exp = _dates()
    days = F.datediff(exp, run_date)

    issues = [
        _iw(raw == "", "Missing health card number"),
        _iw((raw != "") & ~is_valid_format,
            F.concat(F.lit("Invalid Ontario Health Card format. Got: "), raw)),
        _iw((F.length(health_number) == 10) & ~luhn_ok,
            F.concat(F.lit("Health card number '"), health_number,
                     F.lit("' failed Luhn checksum validation"))),
        _iw((raw != "") & is_valid_format & (version != "") & has_bad_version_letter,
            "Invalid version code: contains I/O/Q/U"),
        _iw(exp.isNotNull() & (exp < run_date),
            F.concat(F.lit("Health card expired "), (-days).cast("string"), F.lit(" days ago"))),
        _iw(dob.isNotNull() & (dob > run_date), "Date of birth cannot be in the future"),
    ]
    warnings = [
        _iw((raw != "") & is_valid_format & (version == ""),
            "No version code found. This may be an old-style health card"),
        _iw(exp.isNotNull() & (exp >= run_date) & (days < 90),
            F.concat(F.lit("Health card expires in "), days.cast("string"), F.lit(" days"))),
        _iw(_blank(col("expiry_date")) & (version == ""),
            "No expiry date. Old-style health cards are being phased out"),
    ]
    return _result(
        "ontario_health_card", issues, warnings,
        "Ontario Health Card validation failed",
        "Ontario Health Card validation passed with warnings",
        "Ontario Health Card validation passed",
    )


# V46 state table (us_drivers_license.py:10-95)
US_STATE_FORMATS = [
    ("california", "California", r"^[A-Z]\d{7}$", 16, 5),
    ("texas", "Texas", r"^\d{8}$", 16, 6),
    ("florida", "Florida", r"^[A-Z]\d{12}$", 16, 8),
    ("new_york", "New York", r"^\d{9}$", 16, 8),
    ("illinois", "Illinois", r"^[A-Z]\d{11,12}$", 16, 4),
    ("pennsylvania", "Pennsylvania", r"^\d{8}$", 16, 4),
    ("ohio", "Ohio", r"^[A-Z]{2}\d{6}$", 16, 4),
    ("georgia", "Georgia", r"^\d{9}$", 16, 8),
    ("michigan", "Michigan", r"^[A-Z]\d{12}$", 16, 4),
    ("arizona", "Arizona", r"^[A-Z]\d{8}$|^\d{9}$", 16, 12),
    ("washington", "Washington", r"^[A-Z]{1,7}[A-Z0-9*]{1,11}$", 16, 6),
    ("new_jersey", "New Jersey", r"^[A-Z]\d{14}$", 17, 4),
]

_US_STATE_INDICATORS = {
    "california": ["CA", "CALIFORNIA"], "texas": ["TX", "TEXAS"],
    "florida": ["FL", "FLORIDA"], "new_york": ["NY", "NEW YORK"],
    "illinois": ["IL", "ILLINOIS"], "pennsylvania": ["PA", "PENNSYLVANIA"],
    "ohio": ["OH", "OHIO"], "georgia": ["GA", "GEORGIA"],
    "michigan": ["MI", "MICHIGAN"], "arizona": ["AZ", "ARIZONA"],
    "washington": ["WA", "WASHINGTON"], "new_jersey": ["NJ", "NEW JERSEY"],
}

_LETTER_MATCH_STATES = {"california", "florida", "michigan", "illinois", "new_jersey"}


def _us_state_table() -> Column:
    """Literal struct array of the 12-state table (key, fmt, min_age,
    validity_years, first-letter-check flag, address indicators)."""
    rows = []
    for key, _name, fmt, min_age, vy in US_STATE_FORMATS:
        rows.append(
            F.struct(
                _lit_s(key).alias("key"),
                _lit_s(fmt).alias("fmt"),
                _lit_i(min_age).alias("min_age"),
                _lit_i(vy).alias("validity_years"),
                _lit_b(key in _LETTER_MATCH_STATES).alias("letter_check"),
                F.array(
                    *[F.lit(i) for i in _US_STATE_INDICATORS[key]]
                ).alias("indicators"),
            )
        )
    return F.array(*rows)


def us_drivers_license_validator(run_date: Column, prefix: str = "") -> Column:
    """V46 (validators/us_drivers_license.py:173-352): state from address
    (else by format match), per-state format FAIL, first-letter warn for
    CA/FL/MI/IL/NJ, state min-age, expiry, validity + 2y slack. The
    12-state table is a constant-folded literal array; per-state values
    come from first-match filters over it, not inlined when-chains."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    address = F.upper(F.coalesce(col("address"), F.lit("")))
    raw = F.trim(F.coalesce(col("document_number"), F.lit("")))
    clean = F.regexp_replace(F.upper(raw), r"[\s\-]", "")

    table = _us_state_table()
    by_addr = F.try_element_at(
        F.filter(
            table,
            lambda s: F.exists(s["indicators"], lambda i: address.contains(i)),
        ),
        F.lit(1),
    )
    by_fmt = F.try_element_at(
        F.filter(table, lambda s: F.regexp_like(clean, s["fmt"])), F.lit(1)
    )
    # Bind the resolved state row once; everything below references the
    # lambda variable (tree appears once, evaluated once per row).
    resolved = F.coalesce(by_addr, by_fmt)

    def build(st: Column) -> Column:
        state = st["key"]
        has_state = state.isNotNull()
        fmt_ok_for_state = F.when(
            has_state, F.regexp_like(clean, st["fmt"])
        ).otherwise(F.lit(False))
        min_age_for_state = F.coalesce(st["min_age"], F.lit(16))
        validity_for_state = st["validity_years"]
        letter_state = F.coalesce(st["letter_check"], F.lit(False))

        generic_ok = clean.rlike(r"^[A-Z0-9]{6,16}$")
        last_name = _last_name_param(F.lit("field_first"), prefix)
        letter = F.substring(clean, 1, 1)

        dob, issue_d, exp = _dates()
        age = _age_expr(run_date, dob)
        days = F.datediff(exp, run_date)
        validity = F.datediff(exp, issue_d) / 365.25
        has_validity = issue_d.isNotNull() & exp.isNotNull()

        issues = [
            _iw(clean == "", "Missing license number"),
            _iw((clean != "") & has_state & ~fmt_ok_for_state,
                F.concat(F.lit("License number doesn't match state format. Got: "), raw)),
            _iw((clean != "") & ~has_state & ~generic_ok,
                F.concat(F.lit("Invalid US license format. Got: "), raw)),
            _iw(dob.isNotNull() & (age < min_age_for_state),
                F.concat(F.lit("Person is "), age.cast("string"),
                         F.lit(" years old. Below state minimum driving age"))),
            _iw(exp.isNotNull() & (exp < run_date),
                F.concat(F.lit("License expired "), (-days).cast("string"), F.lit(" days ago"))),
        ]
        warnings = [
            _iw((clean != "") & ~has_state & generic_ok,
                "Could not determine specific state. Using generic US format validation."),
            _iw((clean != "") & (last_name != "") & letter_state & letter.rlike("[A-Z]")
                & (letter != F.upper(F.substring(last_name, 1, 1))),
                F.concat(F.lit("License first letter '"), letter,
                         F.lit("' may not match last name initial"))),
            _iw(dob.isNotNull() & (age >= min_age_for_state) & (age < 18),
                F.concat(F.lit("Person is "), age.cast("string"),
                         F.lit(". May have restricted license (graduated licensing)"))),
            _iw(exp.isNotNull() & (exp >= run_date) & (days < 30),
                F.concat(F.lit("License expires in "), days.cast("string"), F.lit(" days"))),
            _iw(has_validity & has_state
                & (validity > validity_for_state.cast("double") + 2),
                "Validity period exceeds typical state license term"),
        ]
        return _result(
            "us_drivers_license", issues, warnings,
            "US Driver's License validation failed",
            "US Driver's License validation passed with warnings",
            "US Driver's License validation passed",
        )

    # resolved may be NULL (no state detected) — transform over a
    # 1-element array still binds it once; build() handles NULL fields.
    return F.try_element_at(F.transform(F.array(resolved), build), F.lit(1))


# ------------------------------------------------------------- dispatch


def type_specific_validator(doc_type_enum: Column, run_date: Column, prefix: str = "") -> Column:
    """The 36-entry dispatch map (validation_service.py:129-239): the DL
    and passport families resolve their config row by name from literal
    config arrays (one copy of each family's logic in the plan); the six
    bespoke validators dispatch on the enum. NULL when the type has no
    validator (e.g. unknown)."""
    dl = _pick(
        F.filter(_dl_cfg_array(), lambda c: c["name"] == doc_type_enum),
        lambda c: _dl_result(c, run_date, prefix),
    )
    pp = _pick(
        F.filter(_pp_cfg_array(), lambda c: c["name"] == doc_type_enum),
        lambda c: _pp_result(c, run_date, prefix),
    )
    return F.coalesce(
        dl,
        pp,
        F.when(doc_type_enum == "ontario_health_card",
               ontario_health_card_validator(run_date, prefix)),
        F.when(doc_type_enum == "canadian_passport",
               canadian_passport_validator(run_date, prefix)),
        F.when(doc_type_enum == "generic_passport",
               generic_passport_validator(run_date, prefix)),
        F.when(
            doc_type_enum.isin(
                "ontario_photo_card", "bc_photo_id", "alberta_photo_id", "generic_photo_id"
            ),
            generic_photo_id_validator(run_date, prefix),
        ),
        F.when(doc_type_enum == "canada_pr_card",
               canada_pr_card_validator(run_date, prefix)),
        F.when(doc_type_enum == "us_drivers_license",
               us_drivers_license_validator(run_date, prefix)),
    )


def doc_type_enum_expr(document_type: Column) -> Column:
    """document_type string -> validator-lookup enum: dynamic
    ``<country>_passport`` types map to generic_passport
    (document_type_detector.py:449-461 + DocumentTypeInfo.document_type_enum)."""
    known = (
        set(DL_CONFIGS)
        | set(PASSPORT_CONFIGS)
        | {
            "ontario_health_card", "canadian_passport", "generic_passport",
            "ontario_photo_card", "bc_photo_id", "alberta_photo_id",
            "generic_photo_id", "canada_pr_card", "us_drivers_license",
            "generic_id", "unknown",
        }
    )
    return (
        F.when(document_type.isin(*known), document_type)
        .when(document_type.endswith("_passport"), F.lit("generic_passport"))
        .otherwise(F.lit("unknown"))
    )


def validation_results_expr(
    doc_type_enum: Column, run_date: Column, minimum_age: int = 18, prefix: str = ""
) -> Column:
    """Full battery: 5 base validators + the dispatched type-specific one
    (validation_service.py:283-295)."""
    base = F.array(
        data_consistency_validator(run_date, prefix),
        document_expiry_validator(run_date, prefix),
        age_validator(run_date, minimum_age, prefix),
        document_format_validator(prefix),
        face_matching_validator(),
    )
    specific = type_specific_validator(doc_type_enum, run_date, prefix)
    return F.filter(
        F.concat(base, F.array(specific)), lambda r: r.isNotNull()
    )


def _round_half_even_2(x: Column) -> Column:
    """round(x, 2) with Python's round-half-to-even tie behavior (the
    reference uses round(), validation_service.py:411; Spark's F.round is
    HALF_UP, which diverges on exact ties like 0.125 -> 0.13 vs 0.12)."""
    scaled = x * 100
    fl = F.floor(scaled)
    tie = (scaled - fl) == 0.5
    hundredths = F.when(
        tie, F.when(fl % 2 == 0, fl).otherwise(fl + 1)
    ).otherwise(F.round(scaled, 0))
    return hundredths / 100


def validation_summary_expr(results: Column) -> Column:
    """V-agg (validation_service.py:390-428): score =
    (passed + 0.5*warnings) / active; FAILED > WARNING > PASSED > SKIPPED."""
    def count(status: str) -> Column:
        return F.size(F.filter(results, lambda r: r["status"] == status))

    passed, failed = count("passed"), count("failed")
    warnings, skipped = count("warning"), count("skipped")
    total = F.size(results)
    active = total - skipped
    score = F.when(
        active > 0,
        _round_half_even_2((passed + warnings * 0.5) / active.cast("double")),
    ).otherwise(F.lit(0.0))
    overall = (
        F.when(failed > 0, "failed")
        .when(warnings > 0, "warning")
        .when(passed > 0, "passed")
        .otherwise("skipped")
    )
    return F.struct(
        overall.alias("overall_status"),
        score.alias("validation_score"),
        total.alias("total_checks"),
        passed.alias("passed_checks"),
        failed.alias("failed_checks"),
        warnings.alias("warning_checks"),
        skipped.alias("skipped_checks"),
    )
