"""Dispatcher tests — fixture family C (interleaved media, FIXTURES.md §5),
multi-span reassembly (A6), and the error contract."""

import json

from parserpdf_spark.kernels.extract import extract_document, extract_document_safe


def html_span(text, offset):
    return {"kind": "html", "text": text, "media_ref": None, "offset": offset}


def media_span(ref, offset):
    return {"kind": "media", "text": None, "media_ref": ref, "offset": offset}


def pdf_span(d, offset, media_ref=None):
    return {
        "kind": "pdf_block",
        "text": json.dumps(d),
        "media_ref": media_ref,
        "offset": offset,
    }


BLOCK = {"page": 0, "bbox": [50, 100, 550, 140], "font_size": 10,
         "text": "Body text.", "block_type_hint": None}


def test_a6_split_spans_equal_unsplit():
    whole = "<body><h1>Title</h1><p>Alpha beta gamma.</p><ul><li>a</li><li>b</li></ul></body>"
    unsplit = extract_document([html_span(whole, 0)])
    split = extract_document(
        [
            html_span("<body><h1>Title</h1>", 0),
            html_span("<p>Alpha beta gamma.</p>", 1),
            html_span("<ul><li>a</li><li>b</li></ul></body>", 2),
        ]
    )
    assert split == unsplit
    assert [s["offset"] for s in split] == [0, 1, 2]


def test_a6_split_mid_element():
    # an element whose open/close live in different input spans
    split = extract_document(
        [
            html_span("<p>Alpha ", 0),
            html_span("beta gamma.</p>", 1),
        ]
    )
    assert [(s["kind"], s["text"]) for s in split] == [("para", "Alpha beta gamma.")]


def test_c1_leading_media():
    doc = [
        media_span("_page_0_Picture_1.jpeg", 0),
        html_span("<h1>T</h1><p>Prose.</p>", 1),
    ]
    spans = extract_document(doc)
    assert [(s["kind"], s["media_ref"], s["offset"]) for s in spans] == [
        ("image", "_page_0_Picture_1.jpeg", 0),
        ("heading", None, 1),
        ("para", None, 2),
    ]


def test_c2_interleaved_media_exact_positions():
    doc = [
        html_span("<p>one</p>", 0),
        media_span("a.jpeg", 1),
        html_span("<p>two</p>", 2),
        media_span("b.jpeg", 3),
        html_span("<p>three</p>", 4),
    ]
    spans = extract_document(doc)
    assert [(s["kind"], s["text"] if s["kind"] == "para" else s["media_ref"]) for s in spans] == [
        ("para", "one"),
        ("image", "a.jpeg"),
        ("para", "two"),
        ("image", "b.jpeg"),
        ("para", "three"),
    ]


def test_c2_media_inside_split_element():
    # media arrives between two html chunks that belong to one <article>
    doc = [
        html_span("<article><p>one</p>", 0),
        media_span("m.jpeg", 1),
        html_span("<p>two</p></article>", 2),
    ]
    spans = extract_document(doc)
    assert [s["kind"] for s in spans] == ["para", "image", "para"]


def test_c3_image_count_invariant():
    for k in (0, 1, 7):
        doc = [html_span("<p>text here</p>", 0)] + [
            media_span(f"_page_{i}_Figure_1.jpeg", i + 1) for i in range(k)
        ]
        out, metrics = extract_document_safe(doc)
        assert metrics["n_images"] == k
        assert sum(1 for s in out if s["kind"] == "image") == k


def test_media_interrupts_pdf_run():
    doc = [
        pdf_span(dict(BLOCK, text="Before."), 0),
        media_span("mid.jpeg", 1),
        pdf_span(dict(BLOCK, bbox=[50, 200, 550, 240], text="After."), 2),
    ]
    spans = extract_document(doc)
    assert [(s["kind"], s["text"] or s["media_ref"]) for s in spans] == [
        ("para", "Before."),
        ("image", "mid.jpeg"),
        ("para", "After."),
    ]


def test_offsets_respected_not_list_order():
    doc = [
        html_span("<p>two</p>", 5),
        html_span("<p>one</p>", 1),
    ]
    spans = extract_document(doc)
    assert [s["text"] for s in spans] == ["one", "two"]


def test_error_contract_never_raises():
    bad = [pdf_span(BLOCK, 0)]
    bad[0]["text"] = "{broken"
    out, metrics = extract_document_safe(bad)
    assert out == []
    assert metrics["status"] == "error"
    assert "ValueError" in metrics["error"]
    assert metrics["n_input_spans"] == 1

    out, metrics = extract_document_safe(
        [{"kind": "mystery", "text": "", "media_ref": None, "offset": 0}]
    )
    assert metrics["status"] == "error"

    out, metrics = extract_document_safe(None)
    assert metrics["status"] == "ok"
    assert out == []


def test_mixed_pdf_and_html_runs():
    doc = [
        html_span("<h1>Web part</h1>", 0),
        pdf_span(dict(BLOCK, text="Pdf part."), 1),
        html_span("<p>Tail.</p>", 2),
    ]
    spans = extract_document(doc)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("heading", "# Web part"),
        ("para", "Pdf part."),
        ("para", "Tail."),
    ]
