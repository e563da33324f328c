"""Minimal OpenDocument Spreadsheet writer (stdlib only).

The reference exports its three report sheets as ONE .ods file via
``pyexcel_ods.save_data`` (reference ``export.py:288-296``).  That library
is not in this environment, so this module writes the ODF package
directly: a zip whose first entry is the uncompressed ``mimetype``, plus
``META-INF/manifest.xml`` and a ``content.xml`` holding one
``table:table`` per sheet (ODF 1.2 package structure).  Cells carry
``office:value-type`` float for numbers and string otherwise — the same
typing pyexcel applies.

This is a driver-side report sink by design (like the reference's): the
sheets are small denormalized reports, not the bulk data path (bulk
export is the distributed parquet/csv/json writers in ``export.py``).
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape, quoteattr

_MIMETYPE = "application/vnd.oasis.opendocument.spreadsheet"

# characters outside the XML 1.0 Char production (escape() passes them
# through, producing a file no parser will read) — stripped before writing
_XML_INVALID = re.compile(
    "[^\x09\x0a\x0d\x20-\ud7ff\ue000-\ufffd\U00010000-\U0010ffff]")


def _xml_text(s: str) -> str:
    return escape(_XML_INVALID.sub("", s))

_MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
 <manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>
 <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
</manifest:manifest>
"""

_CONTENT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<office:document-content '
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'office:version="1.2">'
    "<office:body><office:spreadsheet>"
)
_CONTENT_TAIL = "</office:spreadsheet></office:body></office:document-content>"


def _cell_xml(value) -> str:
    if value is None:
        return "<table:table-cell/>"
    if isinstance(value, bool):
        value = str(value)
    elif isinstance(value, (int, float)):
        v = escape(repr(value))
        return (f'<table:table-cell office:value-type="float" office:value="{v}">'
                f"<text:p>{v}</text:p></table:table-cell>")
    s = _xml_text(str(value))
    return (f'<table:table-cell office:value-type="string">'
            f"<text:p>{s}</text:p></table:table-cell>")


def save_ods(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: [[cell, ...], ...]}`` as one .ods file."""
    parts = [_CONTENT_HEAD]
    for name, rows in sheets.items():
        # quoteattr: attribute values need quote escaping too (escape()
        # only handles & < >, so a sheet name with '"' would corrupt the file)
        parts.append(
            f"<table:table table:name={quoteattr(_XML_INVALID.sub('', str(name)))}>")
        for row in rows:
            parts.append("<table:table-row>")
            parts.extend(_cell_xml(v) for v in row)
            parts.append("</table:table-row>")
        parts.append("</table:table>")
    parts.append(_CONTENT_TAIL)
    content = "".join(parts)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        # ODF requires the mimetype entry FIRST and uncompressed
        z.writestr(zipfile.ZipInfo("mimetype"), _MIMETYPE,
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", _MANIFEST)
        z.writestr("content.xml", content)


def read_ods_rows(path: str) -> dict[str, list[list]]:
    """Parse an .ods written by :func:`save_ods` back to rows (round-trip
    verification; handles only the subset this module emits)."""
    import xml.etree.ElementTree as ET

    ns = {
        "office": "urn:oasis:names:tc:opendocument:xmlns:office:1.0",
        "table": "urn:oasis:names:tc:opendocument:xmlns:table:1.0",
        "text": "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
    }
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    out: dict[str, list[list]] = {}
    for tbl in root.iter(f"{{{ns['table']}}}table"):
        name = tbl.get(f"{{{ns['table']}}}name")
        rows = []
        for tr in tbl.findall(f"{{{ns['table']}}}table-row"):
            row = []
            for tc in tr.findall(f"{{{ns['table']}}}table-cell"):
                vt = tc.get(f"{{{ns['office']}}}value-type")
                if vt is None:
                    row.append(None)
                elif vt == "float":
                    raw = tc.get(f"{{{ns['office']}}}value")
                    num = float(raw)
                    row.append(int(num) if num.is_integer() and "." not in raw
                               else num)
                else:
                    p = tc.find(f"{{{ns['text']}}}p")
                    row.append(p.text or "" if p is not None else "")
            rows.append(row)
        out[name] = rows
    return out
