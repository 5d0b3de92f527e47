"""HTML kernel unit tests — fixture family A (FIXTURES.md §3).

Pure pandas/python, no Spark.  Models the reference's own minimal HTML
test input (reference tests/test_converters.py:24-29) plus the
boilerplate families named in the north star.
"""

from parserpdf_spark.kernels.html_extract import extract_html


def kinds(spans):
    return [s["kind"] for s in spans]


def test_a1_trivial_reference_case():
    # the reference's own test html (tests/test_converters.py:24-29)
    spans = extract_html(
        "<html><body><h1>Test</h1><p>Hello World</p></body></html>"
    )
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("heading", "# Test"),
        ("para", "Hello World"),
    ]


NAV = (
    "<nav><ul>"
    + "".join(f'<li><a href="/p{i}">Link {i}</a></li>' for i in range(12))
    + "</ul></nav>"
)
ARTICLE = (
    "<article><h1>Deep Learning</h1>"
    "<p>" + "Neural networks learn hierarchical representations. " * 5 + "</p>"
    "<h2>Methods</h2>"
    "<p>" + "We trained a large model on a large corpus. " * 5 + "</p>"
    "</article>"
)


def test_a2_nav_boilerplate_dropped():
    spans = extract_html(f"<body>{NAV}{ARTICLE}{NAV}</body>")
    assert kinds(spans) == ["heading", "para", "heading", "para"]
    assert spans[0]["text"] == "# Deep Learning"
    assert spans[2]["text"] == "## Methods"
    assert all("Link" not in s["text"] for s in spans)


def test_a3_footer_sidebar_chrome_dropped_content_list_kept():
    footer = (
        "<footer><ul>"
        + "".join(f'<li><a href="/f{i}">Footer {i}</a></li>' for i in range(8))
        + "</ul></footer>"
    )
    # sidebar is a link farm in a plain div (scored container)
    sidebar = (
        "<div><ul>"
        + "".join(f'<li><a href="/s{i}">Side {i}</a></li>' for i in range(6))
        + "</ul></div>"
    )
    content = (
        "<main><h1>Recipes</h1>"
        "<p>Cooking is the art of heat applied with patience and care.</p>"
        "<ul><li>Flour and water</li><li>Salt to taste</li>"
        "<li>Heat until golden</li></ul></main>"
    )
    spans = extract_html(f"<body>{sidebar}{content}{footer}</body>")
    assert kinds(spans) == ["heading", "para", "list"]
    assert spans[2]["text"] == (
        "- Flour and water\n- Salt to taste\n- Heat until golden"
    )
    assert all("Side" not in s["text"] and "Footer" not in s["text"] for s in spans)


def test_a4_high_tag_density_dropped_decoration_normalized():
    deco = "<div>" + "<span><span><b></b></span></span>" * 10 + "<i>x</i></div>"
    content = (
        "<div><p>Plain <span>decorated</span> <b>bold</b> prose with "
        "enough text to read naturally and carry the page.</p></div>"
    )
    spans = extract_html(f"<body>{deco}{content}</body>")
    assert kinds(spans) == ["para"]
    assert spans[0]["text"] == (
        "Plain decorated **bold** prose with enough text to read "
        "naturally and carry the page."
    )


def test_a5_inline_structures():
    html = (
        "<body><article>"
        "<p>See the <a href='https://x.y/z'>full paper</a> for details "
        "about methodology and data collection procedures.</p>"
        "<table><tr><th>name</th><th>score</th></tr>"
        "<tr><td>alpha</td><td>0.9</td></tr>"
        "<tr><td>beta</td><td>0.7</td></tr></table>"
        "<p>Before the image <img src='fig1.jpeg'> after the image "
        "there is more prose here.</p>"
        "</article></body>"
    )
    spans = extract_html(html)
    assert kinds(spans) == ["para", "table", "para", "image", "para"]
    assert "[full paper](https://x.y/z)" in spans[0]["text"]
    assert spans[1]["text"] == (
        "| name | score |\n|---|---|\n| alpha | 0.9 |\n| beta | 0.7 |"
    )
    assert spans[3]["media_ref"] == "fig1.jpeg"
    assert spans[3]["text"] == ""


def test_ordered_list_and_code_and_blockquote():
    html = (
        "<body><ol><li>first</li><li>second</li></ol>"
        "<pre><code>x = 1\ny = 2</code></pre>"
        "<blockquote>Quoted wisdom</blockquote></body>"
    )
    spans = extract_html(html)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("list", "1. first\n2. second"),
        ("code", "x = 1\ny = 2"),
        ("para", "> Quoted wisdom"),
    ]


def test_figure_figcaption():
    spans = extract_html(
        "<body><figure><img src='f.png'>"
        "<figcaption>Fig. 1 The setup</figcaption></figure></body>"
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == [
        ("image", "", "f.png"),
        ("caption", "**Fig. 1 The setup**", None),
    ]


def test_script_style_dropped_stray_text_wrapped():
    spans = extract_html(
        "<body><script>var x=1;</script><style>p{}</style>"
        "Loose text directly in body.</body>"
    )
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("para", "Loose text directly in body.")
    ]


def test_x_media_sentinel():
    spans = extract_html(
        "<body><p>before</p><x-media ref=\"_page_0_Picture_1.jpeg\"/>"
        "<p>after</p></body>"
    )
    assert [(s["kind"], s["media_ref"]) for s in spans] == [
        ("para", None),
        ("image", "_page_0_Picture_1.jpeg"),
        ("para", None),
    ]
