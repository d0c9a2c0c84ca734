"""Generate byte-exact validator-message goldens from the reference.

Runs the reference's own validator classes (/root/reference/app/
services/validators/*) in-process over the 21 ported cases from
tests/test_rules_pipeline.py, with datetime.now() frozen to the pinned
RUN_DATE and the external Verifik client in its disabled default, and
prints a dict {case: {validator_name: (status, message)}} to embed in
tests/test_validator_messages.py.

This is a build-time audit tool, not part of the library: it imports
the reference for ground truth, it does not copy it. pydantic/httpx
(absent here) are stubbed with minimal shims — the validators only use
BaseModel attribute assignment.
"""

from __future__ import annotations

import asyncio
import datetime as dt
import pprint
import sys
import types

REFERENCE = "/root/reference"
RUN_DATE = "2026-01-15"


def _install_stubs() -> None:
    pyd = types.ModuleType("pydantic")

    class BaseModel:
        def __init__(self, **kw):  # noqa: ANN003
            for k, v in kw.items():
                setattr(self, k, v)

    def Field(default=None, default_factory=None, **_kw):  # noqa: ANN001, ANN003, N802
        if default_factory is not None:
            return default_factory()
        return default

    pyd.BaseModel = BaseModel
    pyd.Field = Field
    sys.modules["pydantic"] = pyd

    httpx = types.ModuleType("httpx")
    httpx.AsyncClient = object
    sys.modules["httpx"] = httpx


class _FrozenDatetime(dt.datetime):
    @classmethod
    def now(cls, tz=None):  # noqa: ANN001
        return cls.fromisoformat(RUN_DATE + "T00:00:00")


def _freeze(module) -> None:  # noqa: ANN001
    if getattr(module, "datetime", None) is dt.datetime:
        module.datetime = _FrozenDatetime


def main() -> None:
    _install_stubs()
    sys.path.insert(0, REFERENCE)

    from app.services.validators import (  # noqa: PLC0415
        age_validator, alberta_dl, base, bc_dl, data_consistency,
        document_expiry, document_format, face_matching, manitoba_dl,
        new_brunswick_dl, newfoundland_dl, nova_scotia_dl, nunavut_dl,
        nwt_dl, ontario_dl, pei_dl, quebec_dl, saskatchewan_dl, yukon_dl,
    )

    modules = [
        age_validator, alberta_dl, base, bc_dl, data_consistency,
        document_expiry, document_format, face_matching, manitoba_dl,
        new_brunswick_dl, newfoundland_dl, nova_scotia_dl, nunavut_dl,
        nwt_dl, ontario_dl, pei_dl, quebec_dl, saskatchewan_dl, yukon_dl,
    ]
    for m in modules:
        _freeze(m)

    type_validators = {
        v.name: v
        for v in [
            ontario_dl.OntarioDriversLicenseValidator(),
            bc_dl.BCDriversLicenseValidator(),
            alberta_dl.AlbertaDriversLicenseValidator(),
            quebec_dl.QuebecDriversLicenseValidator(),
            manitoba_dl.ManitobaDriversLicenseValidator(),
            saskatchewan_dl.SaskatchewanDriversLicenseValidator(),
            nova_scotia_dl.NovaScotiaDriversLicenseValidator(),
            new_brunswick_dl.NewBrunswickDriversLicenseValidator(),
            pei_dl.PEIDriversLicenseValidator(),
            newfoundland_dl.NewfoundlandDriversLicenseValidator(),
            nwt_dl.NWTDriversLicenseValidator(),
            nunavut_dl.NunavutDriversLicenseValidator(),
            yukon_dl.YukonDriversLicenseValidator(),
        ]
    }
    base_validators = [
        data_consistency.DataConsistencyValidator(),
        document_expiry.DocumentExpiryValidator(),
        age_validator.AgeValidator(),
        document_format.DocumentFormatValidator(),
        face_matching.FaceMatchingValidator(),
    ]

    sys.path.insert(0, "/root/repo")
    from tests.test_rules_pipeline import VALIDATOR_CASES  # noqa: PLC0415

    goldens: dict[str, dict[str, tuple[str, str]]] = {}
    for name, venum, data, _expect in VALIDATOR_CASES:
        doc = dict(data)
        doc.setdefault("document_type", venum.replace("_drivers_license", ""))
        out: dict[str, tuple[str, str]] = {}
        for v in base_validators + [type_validators[venum]]:
            res = asyncio.run(v.validate(doc))
            status = getattr(res.status, "value", res.status)
            out[res.validator_name] = (str(status), res.message)
        goldens[name] = out

    print("GOLDENS = \\")
    pprint.pprint(goldens, width=100)


if __name__ == "__main__":
    main()
