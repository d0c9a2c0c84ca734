"""Forced-OCR backend registry (reference operator E3,
app/services/pdf_ocr.py:14-46: shell out to ``ocrmypdf --force-ocr
--sidecar`` then re-parse the output PDF with fitz).

Two backends behind capability probes, mirroring the reference's own
``is_available()`` pattern (pdf_ocr.py:94-104):

- **ocrmypdf** (real): batch the Arrow batch's PDFs through one tempdir
  (never a per-row shell-out — SURVEY.md §2.2-E3), re-parse each output
  with fitz. Gated on the binary + fitz being importable; absent in
  this sandbox.
- **synthetic** (deterministic): the sandbox corpus marks raster-only
  page content with ``%%SCAN `` line prefixes — invisible to the
  native text layer (webxtract.ops.extract_pdf skips them), but
  "OCR-able". Forced OCR rasterizes the whole page, so the synthetic
  OCR result is every content line in order with the ``%%SCAN `` prefix
  stripped (native text gets re-OCR'd too, exactly like
  ``ocrmypdf --force-ocr``).
"""

from __future__ import annotations

import shutil

from webxtract.ops import extract_pdf as _ep

OCR_SCAN_MARKER = "%%SCAN "


def is_available() -> bool:
    """True when the real OCR toolchain (ocrmypdf + fitz) is present."""
    return _ep.HAVE_FITZ and shutil.which("ocrmypdf") is not None


def _ocr_via_ocrmypdf(payload: bytes) -> list[str] | None:  # pragma: no cover
    import subprocess
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp)
        inp, outp = tmp_path / "input.pdf", tmp_path / "output.pdf"
        inp.write_bytes(payload)
        try:
            subprocess.run(
                [
                    "ocrmypdf", "--force-ocr",
                    "--sidecar", str(tmp_path / "text.txt"),
                    "--output-type", "pdf",
                    str(inp), str(outp),
                ],
                capture_output=True,
                check=True,
            )
        except subprocess.CalledProcessError:
            return None
        return _ep._pages_via_fitz(outp.read_bytes())


def _ocr_via_synthetic(payload: bytes) -> list[str] | None:
    try:
        doc = payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    lines = doc.split("\n")
    if not lines or not lines[0].startswith("%PDF-"):
        return None
    pages: list[list[str]] = []
    seen_marker = False
    for line in lines[1:]:
        if line.startswith(_ep.PAGE_MARKER):
            pages.append([])
            seen_marker = True
        elif seen_marker:
            if line.startswith(OCR_SCAN_MARKER):
                pages[-1].append(line[len(OCR_SCAN_MARKER):])
            else:
                pages[-1].append(line)
    if not seen_marker:
        return None
    return ["\n".join(p).strip() for p in pages]


def ocr_pdf_pages(payload: bytes) -> list[str] | None:
    """bytes -> per-page OCR'd text (1-indexed order), or None when the
    payload is not OCR-able by any backend."""
    if is_available():  # pragma: no cover — toolchain absent in sandbox
        pages = _ocr_via_ocrmypdf(payload)
        if pages is not None:
            return pages
    return _ocr_via_synthetic(payload)
