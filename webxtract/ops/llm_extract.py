"""Optional batched-LLM field-extraction stage (SURVEY §2.2 E6 /
§2.6 X1) — OFF the correctness path, disabled by default.

The reference's primary extractor is a Claude Vision call per document
(document_extractor.py:204-314). The rebuild's correctness path is the
deterministic parser in webxtract/ops/fields.py; this module is the
flag-gated LLM leg the survey commits to: enabled via
``WEBXTRACT_LLM_EXTRACT_ENABLED=true`` (the same env-gating pattern as
the reference's Verifik client, config.py:7), it runs as ONE
``mapInPandas`` stage whose backend is called once per Arrow batch —
never per row — so at cluster scale each executor issues large batched
requests instead of 10^8 single calls.

Everything around the model call is deterministic and replicated
byte-for-byte from the reference:

- model routing by device type (document_extractor.py:240-249:
  desktop -> expensive model, mobile/default -> cheap model)
- markdown-fence stripping of the response (:279-281)
- the 13-field null default (:286-293)
- whitespace normalization of address/full_name/first_name/last_name
  (:296-304: newlines/tabs -> space, collapse doubles, strip)
- required-field check (:190-201, REQUIRED_FIELDS :10)

The real Anthropic client is import-gated exactly like the reference's
own ``is_available()`` probes (image_ocr.py:82-88) — absent in this
sandbox — and a deterministic stub backend exercises the full Spark
plumbing (schema, batching, fence handling) in tests.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# document_extractor.py:10
REQUIRED_FIELDS = [
    "first_name", "last_name", "document_number", "date_of_birth",
    "expiry_date",
]

# document_extractor.py:286-293 — the 13-field response contract
LLM_FIELDS = [
    "first_name", "last_name", "full_name", "document_number",
    "date_of_birth", "issue_date", "expiry_date", "gender", "address",
    "nationality", "mrz", "country_code", "document_title",
]

_CLEAN_FIELDS = ["address", "full_name", "first_name", "last_name"]


def llm_extract_enabled() -> bool:
    """Default-off feature flag (reference gating pattern config.py:7)."""
    return (
        os.environ.get("WEBXTRACT_LLM_EXTRACT_ENABLED", "false").lower()
        == "true"
    )


def route_model(device_type: str | None) -> str:
    """Model routing by device (document_extractor.py:240-249, env
    overrides :24-26): desktop cameras are worse -> expensive model;
    mobile or unspecified -> cheap model."""
    mobile = os.environ.get(
        "WEBXTRACT_LLM_MODEL_MOBILE", "claude-sonnet-4-20250514"
    )
    desktop = os.environ.get(
        "WEBXTRACT_LLM_MODEL_DESKTOP", "claude-opus-4-20250514"
    )
    return desktop if device_type == "desktop" else mobile


def strip_markdown_fence(text: str) -> str:
    """document_extractor.py:279-281: drop the first and last line when
    the response arrives fenced."""
    result = text.strip()
    if result.startswith("```"):
        lines = result.split("\n")
        result = "\n".join(lines[1:-1])
    return result


def postprocess_response(result_text: str) -> dict:
    """Deterministic response post-processing (document_extractor.py:
    276-304): fence strip, JSON parse, 13-field null default,
    whitespace normalization of the name/address fields."""
    extracted = json.loads(strip_markdown_fence(result_text))
    for field in LLM_FIELDS:
        if field not in extracted:
            extracted[field] = None
    for field in _CLEAN_FIELDS:
        if extracted.get(field) and isinstance(extracted[field], str):
            cleaned = (
                extracted[field]
                .replace("\n", " ").replace("\r", " ").replace("\t", " ")
            )
            while "  " in cleaned:
                cleaned = cleaned.replace("  ", " ")
            extracted[field] = cleaned.strip()
    return extracted


def validate_required_fields(data: dict) -> tuple[bool, list[str]]:
    """document_extractor.py:190-201."""
    missing = []
    for field in REQUIRED_FIELDS:
        value = data.get(field)
        if value is None or (isinstance(value, str) and not value.strip()):
            missing.append(field)
    return len(missing) == 0, missing


# ----------------------------------------------------------------- backends
#
# A backend takes ONE batch of requests
#   [{"image": bytes|None, "media_type": str, "model": str}, ...]
# and returns one response text per request (the raw model output,
# possibly markdown-fenced). Batching contract: callers invoke it once
# per Arrow batch.


def anthropic_available() -> bool:
    try:  # pragma: no cover - sdk not in this sandbox
        import anthropic  # noqa: F401

        return bool(os.environ.get("ANTHROPIC_API_KEY"))
    except Exception:
        return False


def anthropic_backend(requests: list[dict]) -> list[str]:
    """Real Claude Vision leg (document_extractor.py:251-276), gated on
    the sdk + key being present — mirrors the reference's own client
    construction (:180-187). One API call per request inside the batch
    (the Anthropic API has no multi-image batch endpoint; the batching
    win is amortizing client setup + connection reuse per Arrow batch)."""
    if not anthropic_available():  # pragma: no cover
        raise RuntimeError(
            "anthropic sdk/ANTHROPIC_API_KEY unavailable; use the stub "
            "backend or leave WEBXTRACT_LLM_EXTRACT_ENABLED=false"
        )
    import base64  # pragma: no cover

    import anthropic  # pragma: no cover

    client = anthropic.Anthropic()  # pragma: no cover
    out = []  # pragma: no cover
    for req in requests:  # pragma: no cover
        response = client.messages.create(
            model=req["model"],
            max_tokens=1000,
            messages=[{
                "role": "user",
                "content": [
                    {"type": "image",
                     "source": {
                         "type": "base64",
                         "media_type": req["media_type"],
                         "data": base64.standard_b64encode(
                             req["image"]).decode("utf-8"),
                     }},
                    {"type": "text", "text": "Extract the document "
                     "fields as JSON."},
                ],
            }],
        )
        out.append(response.content[0].text.strip())
    return out  # pragma: no cover


# Deterministic stub: synthetic images may carry a %%FIELDS:{json}
# payload (webxtract/synth.py pattern); the stub returns it fenced so
# the fence-stripping path is exercised. Anything else extracts nothing.
_STUB_MARKER = b"%%FIELDS:"


def stub_backend(requests: list[dict]) -> list[str]:
    out = []
    for req in requests:
        blob = req.get("image") or b""
        i = blob.find(_STUB_MARKER)
        if i >= 0:
            j = blob.find(b"\n", i)
            payload = blob[i + len(_STUB_MARKER): j if j > 0 else None]
            out.append("```json\n" + payload.decode("utf-8", "replace") + "\n```")
        else:
            out.append("{}")
    return out


# ------------------------------------------------------------------ operator


def llm_extract(
    df: DataFrame,
    image_col: str = "image",
    media_type_col: str | None = "media_type",
    device_type_col: str | None = "device_type",
    backend: Callable[[list[dict]], list[str]] | None = None,
    enabled: bool | None = None,
) -> DataFrame:
    """Append ``llm_fields`` (13-field struct), ``llm_is_valid`` and
    ``llm_missing`` columns. Disabled (the default) this is a pure
    projection adding NULL columns — zero Python, zero cost — so the
    pipeline shape is identical with the flag on or off and the
    correctness path never depends on the LLM."""
    fields_type = StructType(
        [StructField(n, StringType(), True) for n in LLM_FIELDS]
    )
    if enabled is None:
        enabled = llm_extract_enabled()
    if not enabled:
        return (
            df.withColumn("llm_fields", F.lit(None).cast(fields_type))
            .withColumn("llm_is_valid", F.lit(None).cast("boolean"))
            .withColumn("llm_missing", F.lit(None).cast("array<string>"))
        )

    backend = backend or (
        anthropic_backend if anthropic_available() else stub_backend
    )
    in_schema = df.schema
    out_schema = StructType(
        list(in_schema.fields)
        + [
            StructField("llm_fields", fields_type, True),
            StructField("llm_is_valid", BooleanType(), True),
            StructField("llm_missing", ArrayType(StringType()), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:  # pandas DataFrames
        for pdf in batches:
            reqs = []
            for _, row in pdf.iterrows():
                blob = row[image_col]
                media = (
                    row[media_type_col]
                    if media_type_col and media_type_col in pdf.columns
                    else "image/png"
                )
                device = (
                    row[device_type_col]
                    if device_type_col and device_type_col in pdf.columns
                    else None
                )
                reqs.append({
                    "image": bytes(blob) if blob is not None else None,
                    "media_type": media or "image/png",
                    "model": route_model(device),
                })
            # ONE backend call per Arrow batch — the batching contract
            responses = backend(reqs)
            fields_col, valid_col, missing_col = [], [], []
            for req, text in zip(reqs, responses):
                if not req["image"]:
                    # empty input short-circuit (document_extractor.py:
                    # 232-235): all-null fields, all required missing
                    data = {n: None for n in LLM_FIELDS}
                    ok, missing = False, list(REQUIRED_FIELDS)
                else:
                    data = postprocess_response(text)
                    ok, missing = validate_required_fields(data)
                fields_col.append({n: data.get(n) for n in LLM_FIELDS})
                valid_col.append(ok)
                missing_col.append(missing)
            pdf = pdf.copy()
            pdf["llm_fields"] = fields_col
            pdf["llm_is_valid"] = valid_col
            pdf["llm_missing"] = missing_col
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
