"""PDF layout kernel unit tests — fixture family B (FIXTURES.md §4)."""

import json

import pytest

from parserpdf_spark.kernels.pdf_extract import extract_pdf_blocks


def blk(page, bbox, font_size, text, hint=None):
    return json.dumps(
        {
            "page": page,
            "bbox": bbox,
            "font_size": font_size,
            "text": text,
            "block_type_hint": hint,
        }
    )


def run(raw_pairs):
    return extract_pdf_blocks(raw_pairs)


def test_b1_single_column_title_then_paras_in_y_order():
    blocks = [
        (blk(0, [50, 200, 550, 230], 10, "Second paragraph."), None),
        (blk(0, [50, 50, 550, 90], 18, "A Grand Title"), None),
        (blk(0, [50, 300, 550, 330], 10, "Third paragraph."), None),
        (blk(0, [50, 120, 550, 160], 10, "First paragraph."), None),
        (blk(0, [50, 400, 550, 430], 10, "Fourth paragraph."), None),
    ]
    spans = run(blocks)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("heading", "# A Grand Title"),
        ("para", "First paragraph."),
        ("para", "Second paragraph."),
        ("para", "Third paragraph."),
        ("para", "Fourth paragraph."),
    ]


def test_b2_two_columns_left_before_right():
    # left column x∈[50,290], right x∈[310,550], interleaved y (FIXTURES B2)
    blocks = [
        (blk(0, [310, 100, 550, 140], 10, "R1"), None),
        (blk(0, [50, 300, 290, 340], 10, "L3"), None),
        (blk(0, [50, 100, 290, 140], 10, "L1"), None),
        (blk(0, [310, 300, 550, 340], 10, "R3"), None),
        (blk(0, [50, 200, 290, 240], 10, "L2"), None),
        (blk(0, [310, 200, 550, 240], 10, "R2"), None),
    ]
    spans = run(blocks)
    assert [s["text"] for s in spans] == ["L1", "L2", "L3", "R1", "R2", "R3"]


def test_b3_multipage_spanning_title_and_level2_heading():
    # page 0: full-width title above a 2-column body; page 1: section heading
    blocks = [
        # page 1 first in input — page order must win
        (blk(1, [50, 100, 290, 130], 14, "Discussion"), None),
        (blk(1, [50, 150, 290, 190], 10, "P2 left body."), None),
        (blk(1, [310, 150, 550, 190], 10, "P2 right body."), None),
        (blk(0, [50, 40, 550, 80], 18, "Interleaved Documents at Scale"), None),
        (blk(0, [310, 120, 550, 400], 10, "P1 right col."), None),
        (blk(0, [50, 120, 290, 400], 10, "P1 left col."), None),
    ]
    spans = run(blocks)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("heading", "# Interleaved Documents at Scale"),
        ("para", "P1 left col."),
        ("para", "P1 right col."),
        ("heading", "## Discussion"),
        ("para", "P2 left body."),
        ("para", "P2 right body."),
    ]


def test_b4_aligned_grid_becomes_gfm_table():
    rows_y = [100, 130, 160]
    cols_x = [50, 250, 450]
    cells = ["name", "qty", "price", "bolt", "4", "0.10", "nut", "9", "0.05"]
    blocks = []
    k = 0
    for y in rows_y:
        for x in cols_x:
            blocks.append((blk(0, [x, y, x + 150, y + 20], 10, cells[k]), None))
            k += 1
    # a normal paragraph after the grid
    blocks.append((blk(0, [50, 300, 550, 340], 10, "After the table."), None))
    spans = run(blocks)
    assert [s["kind"] for s in spans] == ["table", "para"]
    assert spans[0]["text"] == (
        "| name | qty | price |\n|---|---|---|\n"
        "| bolt | 4 | 0.10 |\n| nut | 9 | 0.05 |"
    )


def test_b5_figure_then_caption():
    blocks = [
        (blk(0, [50, 50, 550, 80], 10, "Intro text above the figure."), None),
        (
            blk(0, [100, 100, 500, 300], 10, ""),
            "_page_0_Figure_1.jpeg",
        ),
        (blk(0, [100, 305, 500, 325], 9, "Fig. 1 Projected layout."), None),
    ]
    spans = run(blocks)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == [
        ("para", "Intro text above the figure.", None),
        ("image", "", "_page_0_Figure_1.jpeg"),
        ("caption", "**Fig. 1 Projected layout.**", None),
    ]


def test_invalid_json_raises_value_error():
    with pytest.raises(ValueError):
        run([("{not json", None)])
    with pytest.raises(ValueError):
        run([(json.dumps({"page": 0, "bbox": [0, 0], "font_size": 1, "text": "x"}), None)])


def test_hint_overrides():
    blocks = [
        (blk(0, [50, 50, 550, 80], 10, "Forced heading", hint="heading"), None),
        (blk(0, [50, 100, 550, 130], 10, "Normal para"), None),
    ]
    spans = run(blocks)
    assert spans[0] == {"kind": "heading", "text": "# Forced heading", "media_ref": None}
    assert spans[1]["kind"] == "para"
