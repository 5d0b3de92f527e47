"""RTF and EPUB shim kernels: control-word parsing (headings, tables,
cp1252/unicode escapes, destination skipping) and OCF/OPF spine
ordering, plus route_file integration and fuzz."""

import io
import os
import sys
import zipfile

import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.epub_extract import epub_to_html  # noqa: E402
from parserpdf_spark.kernels.rtf_extract import rtf_to_html  # noqa: E402
from parserpdf_spark.sources.files import route_file  # noqa: E402


def test_rtf_structure_escapes_and_destinations():
    rtf = ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times;}}"
           "{\\info{\\title secret}}"
           "\\outlinelevel0\\b Document Title\\b0\\par "
           "\\pard Plain with \\i italics\\i0  and \\'e9 accent "
           "and \\u20013 ? char.\\par "
           "An em\\emdash dash and \\ldblquote quotes\\rdblquote.\\par "
           "\\trowd\\cellx1000 CellA\\cell CellB\\cell\\row "
           "\\trowd\\cellx1000 CellC\\cell CellD\\cell\\row "
           "Last paragraph.\\par }").encode("ascii")
    html = rtf_to_html(rtf)
    assert html.startswith("<body><article><h1>Document Title</h1>")
    assert "é accent" in html and "中" in html
    assert "—" in html and "“quotes”" in html
    assert ("<table><tr><td>CellA</td><td>CellB</td></tr>"
            "<tr><td>CellC</td><td>CellD</td></tr></table>") in html
    assert "secret" not in html  # {\info} destination skipped
    assert "Times" not in html   # fonttbl skipped
    assert "<p>Last paragraph.</p>" in html
    with pytest.raises(ValueError, match="rtf"):
        rtf_to_html(b"plain text, not rtf")


def _epub(spine_first="c1"):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>")
        refs = ("c1", "c2") if spine_first == "c1" else ("c2", "c1")
        zf.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?>'
            '<package xmlns="http://www.idpf.org/2007/opf">'
            '<manifest><item id="c2" href="ch2.xhtml"/>'
            '<item id="c1" href="ch1.xhtml"/></manifest>'
            "<spine>" + "".join(
                f'<itemref idref="{r}"/>' for r in refs) + "</spine>"
            "</package>")
        zf.writestr("OEBPS/ch1.xhtml",
                    "<html><body><h1>One</h1><p>first</p></body></html>")
        zf.writestr("OEBPS/ch2.xhtml",
                    "<html><body><p>second</p></body></html>")
    return buf.getvalue()


def test_epub_spine_order_controls_reading_order():
    html = epub_to_html(_epub("c1"))
    assert html.index("first") < html.index("second")
    html = epub_to_html(_epub("c2"))
    assert html.index("second") < html.index("first")


def test_epub_broken_manifest_falls_back_to_members():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.xhtml", "<body><p>alpha</p></body>")
        zf.writestr("b.xhtml", "<body><p>beta</p></body>")
    html = epub_to_html(buf.getvalue())
    assert "alpha" in html and "beta" in html
    with pytest.raises(ValueError):
        epub_to_html(b"not a zip at all")


def test_route_file_rtf_and_epub():
    rtf = ("{\\rtf1\\ansi \\outlinelevel0 Title\\par body text\\par }"
           ).encode("ascii")
    row = route_file("/x/a.rtf", rtf)
    assert row["ingest_status"] == "ok"
    assert "<h1>Title</h1>" in row["spans"][0]["text"]
    row = route_file("/x/b.epub", _epub())
    assert row["ingest_status"] == "ok"
    assert "<h1>One</h1>" in row["spans"][0]["text"]
    assert route_file("/x/c.rtf", b"junk")["ingest_status"] == "error"
    assert route_file("/x/d.epub", b"junk")["ingest_status"] == "error"


@settings(max_examples=25, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_rtf_epub_kernels_never_crash_uncontrolled(junk):
    for data in (junk, b"{\\rtf1" + junk, b"PK\x03\x04" + junk):
        for fn in (rtf_to_html, epub_to_html):
            try:
                fn(data)
            except ValueError:
                pass
        for ext in (".rtf", ".epub"):
            assert route_file(f"/x/f{ext}", data)["ingest_status"] in (
                "ok", "error")


def test_drm_epub_entry_is_status_not_crash():
    """zipfile raises RuntimeError for password-flagged entries and
    NotImplementedError for AES compression — both must stay inside the
    keep-with-status contract (review finding)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="c.opf"/></rootfiles>'
            "</container>")
        zf.writestr("c.opf",
                    '<package xmlns="http://www.idpf.org/2007/opf">'
                    '<manifest><item id="a" href="x.xhtml"/></manifest>'
                    '<spine><itemref idref="a"/></spine></package>')
        zf.writestr("x.xhtml", "<body><p>t</p></body>")
    data = bytearray(buf.getvalue())
    at = data.find(b"x.xhtml")
    lh = data.rfind(b"PK\x03\x04", 0, at)
    data[lh + 6] |= 0x01  # encrypted flag on the local header
    row = route_file("/x/drm.epub", bytes(data))
    assert row["ingest_status"] in ("ok", "error")  # never an escape


def test_epub_percent_encoded_spine_hrefs_resolve():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="c.opf"/></rootfiles>'
            "</container>")
        zf.writestr("c.opf",
                    '<package xmlns="http://www.idpf.org/2007/opf">'
                    '<manifest>'
                    '<item id="a" href="ch%20one.xhtml#frag"/></manifest>'
                    '<spine><itemref idref="a"/></spine></package>')
        zf.writestr("ch one.xhtml", "<body><p>spaced</p></body>")
    assert "spaced" in epub_to_html(buf.getvalue())


def test_rtf_truncated_mid_row_keeps_cells():
    html = rtf_to_html(b"{\\rtf1 \\trowd A\\cell B\\cell }")
    assert "<td>A</td><td>B</td>" in html


def test_odt_structure_and_media():
    """ODT shim: heading levels, space runs/tabs, tables, lists, and
    the Pictures/* media bridge."""
    import io as _io

    from parserpdf_spark.kernels.odt_extract import (
        odt_media_rows,
        odt_to_html,
    )
    from parserpdf_spark.sources.files import file_media_rows

    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    TAB = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    content = (f'<?xml version="1.0"?><office:document-content '
               f'xmlns:office="{O}" xmlns:text="{T}" xmlns:table="{TAB}">'
               "<office:body><office:text>"
               '<text:h text:outline-level="2">Title</text:h>'
               '<text:p>First <text:s text:c="2"/>para'
               "<text:tab/>gap.</text:p>"
               "<table:table><table:table-row>"
               "<table:table-cell><text:p>A</text:p></table:table-cell>"
               "<table:table-cell><text:p>B</text:p></table:table-cell>"
               "</table:table-row></table:table>"
               "<text:list><text:list-item><text:p>one</text:p>"
               "</text:list-item></text:list>"
               "</office:text></office:body></office:document-content>")
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
        zf.writestr("Pictures/img1.png", b"\x89PNG fake")
    html = odt_to_html(buf.getvalue())
    assert "<h2>Title</h2>" in html
    assert "<p>First   para gap.</p>" in html
    assert "<table><tr><td>A</td><td>B</td></tr></table>" in html
    assert "<ul><li>one</li></ul>" in html
    assert odt_media_rows(buf.getvalue()) == [
        ("Pictures/img1.png", b"\x89PNG fake")]
    m = file_media_rows("/x/a.odt", buf.getvalue())
    assert m[0]["media_ref"] == "Pictures/img1.png"
    row = route_file("/x/a.odt", buf.getvalue())
    assert row["ingest_status"] == "ok"
    assert route_file("/x/bad.odt", b"junk")["ingest_status"] == "error"
    with pytest.raises(ValueError):
        odt_to_html(b"not a zip")


def test_odt_deep_nesting_stays_valueerror():
    """A crafted deeply-nested content.xml must not escape as
    RecursionError (keep-with-status)."""
    import io as _io

    from parserpdf_spark.kernels.odt_extract import odt_to_html

    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    depth = 50000
    content = (f'<?xml version="1.0"?><office:document-content '
               f'xmlns:office="{O}" xmlns:text="{T}">'
               "<office:body><office:text><text:p>"
               + "<text:span>" * depth + "x" + "</text:span>" * depth
               + "</text:p></office:text></office:body>"
               "</office:document-content>")
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml", content)
    try:
        odt_to_html(buf.getvalue())
    except ValueError:
        pass  # either decodes or fails INSIDE the contract
    assert route_file("/x/deep.odt", buf.getvalue())["ingest_status"] in (
        "ok", "error")


def test_odt_space_run_count_is_capped():
    """A crafted text:c="2000000000" must not allocate a multi-GB
    string (ADVICE r4): the run caps at 4096 and the document still
    extracts ok; a malformed count stays inside the ValueError
    contract."""
    import io as _io

    from parserpdf_spark.kernels.odt_extract import odt_to_html

    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

    def _odt(count):
        content = (f'<?xml version="1.0"?><office:document-content '
                   f'xmlns:office="{O}" xmlns:text="{T}">'
                   "<office:body><office:text>"
                   f'<text:p>a<text:s text:c="{count}"/>b</text:p>'
                   "</office:text></office:body>"
                   "</office:document-content>")
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("content.xml", content)
        return buf.getvalue()

    html = odt_to_html(_odt(2_000_000_000))
    assert len(html) < 10_000  # capped, not 2 GB
    assert "a" + " " * 4096 + "b" in html
    assert odt_to_html(_odt(-5)) == "<body><article><p>ab</p></article></body>"
    with pytest.raises(ValueError, match="text:s"):
        odt_to_html(_odt("notanumber"))
    assert route_file(
        "/x/sbomb.odt", _odt(2_000_000_000))["ingest_status"] == "ok"


def test_zip_bomb_members_stay_bounded():
    """A small member that inflates past the 64 MiB cap must raise
    ValueError (docx/odt content) or be skipped (epub spine members,
    media parts) instead of OOMing the task (ADVICE r4)."""
    import io as _io

    from parserpdf_spark.kernels.odt_extract import odt_to_html
    from parserpdf_spark.kernels.ziputil import (
        MAX_MEMBER_BYTES,
        bounded_read,
    )

    bomb = b"\x00" * (MAX_MEMBER_BYTES + 1024)  # ~64 KiB compressed

    # unit: declared-size rejection, plus a normal member passes
    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("bomb.bin", bomb)
        zf.writestr("ok.bin", b"fine")
    zf = zipfile.ZipFile(_io.BytesIO(buf.getvalue()))
    assert bounded_read(zf, "ok.bin") == b"fine"
    with pytest.raises(ValueError, match="cap"):
        bounded_read(zf, "bomb.bin")
    with pytest.raises(ValueError, match="cap"):
        bounded_read(zf, "ok.bin", cap=2)

    # odt: bomb content.xml → ValueError → route_file status="error"
    obuf = _io.BytesIO()
    with zipfile.ZipFile(obuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("content.xml", bomb)
    with pytest.raises(ValueError, match="cap"):
        odt_to_html(obuf.getvalue())
    assert route_file(
        "/x/bomb.odt", obuf.getvalue())["ingest_status"] == "error"

    # epub: one bomb spine item is skipped, the rest of the book reads
    ebuf = _io.BytesIO()
    with zipfile.ZipFile(ebuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="c.opf"/></rootfiles>'
            "</container>")
        zf.writestr("c.opf",
                    '<package xmlns="http://www.idpf.org/2007/opf">'
                    '<manifest><item id="a" href="bomb.xhtml"/>'
                    '<item id="b" href="good.xhtml"/></manifest>'
                    '<spine><itemref idref="a"/><itemref idref="b"/>'
                    "</spine></package>")
        zf.writestr("bomb.xhtml", bomb)
        zf.writestr("good.xhtml", "<body><p>survives</p></body>")
    html = epub_to_html(ebuf.getvalue())
    assert "survives" in html and len(html) < 10_000

    # docx media bridge: bomb media part dropped, sibling kept
    from parserpdf_spark.sources.files import file_media_rows

    dbuf = _io.BytesIO()
    with zipfile.ZipFile(dbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("word/document.xml", "<d/>")
        zf.writestr("word/media/bomb.png", bomb)
        zf.writestr("word/media/ok.png", b"\x89PNG ok")
    rows = file_media_rows("/x/m.docx", dbuf.getvalue())
    assert [r["media_ref"] for r in rows] == ["media/ok.png"]


def test_rtf_uc_skip_is_group_scoped():
    """\\uc inside a nested group must not leak to the enclosing text
    (ADVICE r4): the spec scopes the count per group."""
    html = rtf_to_html(
        b"{\\rtf1 {\\uc2\\u20013 ??} \\u20013 ?X\\par }")
    assert "<p>中 中X</p>" in html
