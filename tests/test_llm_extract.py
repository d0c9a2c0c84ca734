"""Flag-gated batched-LLM E6 stage (SURVEY §2.2; reference
document_extractor.py:204-314). The deterministic post-processing is
unit-tested directly; the Spark plumbing (schema, Arrow batching,
disabled passthrough) runs against the stub backend."""

import json

import pytest
from pyspark.sql import functions as F

from webxtract.ops.llm_extract import (
    LLM_FIELDS,
    REQUIRED_FIELDS,
    llm_extract,
    postprocess_response,
    route_model,
    strip_markdown_fence,
    stub_backend,
    validate_required_fields,
)


def test_fence_strip_and_defaults():
    # markdown fence dropped (document_extractor.py:279-281), absent
    # fields defaulted to None (:286-293)
    text = "```json\n" + json.dumps({"first_name": "ANA"}) + "\n```"
    data = postprocess_response(text)
    assert data["first_name"] == "ANA"
    assert set(data) == set(LLM_FIELDS)
    assert data["mrz"] is None


def test_whitespace_normalization():
    # newlines/tabs -> space, doubles collapsed, strip (:296-304);
    # non-clean fields untouched
    text = json.dumps({
        "full_name": " DOE,\n\tJOHN  X ",
        "address": "1 MAIN\r\nST",
        "mrz": "A\nB",
    })
    data = postprocess_response(text)
    assert data["full_name"] == "DOE, JOHN X"
    assert data["address"] == "1 MAIN ST"
    assert data["mrz"] == "A\nB"


def test_required_fields_check():
    # blank-after-strip counts as missing (:190-201)
    data = {n: "x" for n in REQUIRED_FIELDS}
    data["expiry_date"] = "  "
    ok, missing = validate_required_fields(data)
    assert not ok and missing == ["expiry_date"]
    data["expiry_date"] = "2030-01-01"
    assert validate_required_fields(data) == (True, [])


def test_model_routing():
    # desktop -> expensive, mobile/None -> cheap (:240-249)
    assert route_model("desktop") != route_model("mobile")
    assert route_model(None) == route_model("mobile")


def test_stub_backend_shapes():
    out = stub_backend([
        {"image": b'junk%%FIELDS:{"first_name":"A"}\nmore'},
        {"image": b"no marker"},
    ])
    assert json.loads(strip_markdown_fence(out[0])) == {"first_name": "A"}
    assert out[1] == "{}"


@pytest.fixture(scope="module")
def frame(spark):
    payload = {
        "first_name": "ANA", "last_name": "DOE", "full_name": "DOE,\nANA",
        "document_number": "D1234-56789-01234", "date_of_birth": "1990-01-01",
        "expiry_date": "2030-01-01",
    }
    rows = [
        (1, b"img%%FIELDS:" + json.dumps(payload).encode() + b"\n", "image/png", "desktop"),
        (2, b"img%%FIELDS:" + json.dumps({"first_name": "BOB"}).encode() + b"\n",
         "image/jpeg", "mobile"),
        (3, None, None, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, image binary, media_type string, device_type string"
    )


def test_disabled_is_null_passthrough(frame):
    out = llm_extract(frame, enabled=False)
    rows = out.orderBy("doc_id").collect()
    assert [r["llm_fields"] for r in rows] == [None, None, None]
    assert [r["llm_is_valid"] for r in rows] == [None, None, None]
    # pure projection: no Python stage in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_enabled_stub_end_to_end(frame):
    out = llm_extract(frame, backend=stub_backend, enabled=True).orderBy("doc_id")
    rows = out.collect()
    r1, r2, r3 = rows
    assert r1["llm_fields"]["full_name"] == "DOE, ANA"  # normalized
    assert r1["llm_is_valid"] is True and r1["llm_missing"] == []
    assert r2["llm_fields"]["first_name"] == "BOB"
    assert r2["llm_is_valid"] is False
    assert "last_name" in r2["llm_missing"]
    # empty image short-circuit (document_extractor.py:232-235)
    assert r3["llm_is_valid"] is False
    assert r3["llm_missing"] == REQUIRED_FIELDS
    assert all(v is None for v in r3["llm_fields"].asDict().values())
    # plan shape: exactly one Python stage (AQE repeats the tree under
    # "== Initial Plan ==" — count the final plan only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.split("== Initial Plan ==")[0].count("MapInPandas") == 1
