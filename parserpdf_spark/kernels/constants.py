"""Frozen heuristic constants.

These are committed alongside the golden fixtures: changing any value
changes golden outputs (SURVEY.md §7.4-2), so bump them only together
with regenerated goldens (``python tools/make_goldens.py``).
"""

# --- HTML boilerplate heuristics -------------------------------------------
# Tags whose entire subtree is chrome, never content.  Models the
# "nav/footer/sidebar chrome" families the reference's extractor strips
# (FIXTURES.md §3 A2/A3; reference behavior observable in the golden
# markdown, which contains no navigation text).
DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "nav",
        "footer",
        "header",
        "head",  # whole <head> incl. <title> is metadata, never content
        "aside",
        "form",
        "button",
        "iframe",
        "svg",
        "template",
    }
)

# Container tags that get boilerplate-scored (link-text ratio + tag density).
SCORED_TAGS = frozenset({"div", "section", "ul", "ol", "dl", "table", "menu"})

# The tag-density rule only applies to generic containers; structural tags
# (table/ul/ol/dl) are inherently tag-dense and are judged only by the
# link-farm rule.
DENSITY_SCORED_TAGS = frozenset({"div", "section", "menu"})

# A scored container is a link farm when most of its text is link text.
LINK_RATIO_MAX = 0.6
MIN_LINKS_FOR_FARM = 3

# A scored container is decorative when it has many tags and almost no text.
MIN_CHARS_PER_TAG = 5.0
MIN_TAGS_FOR_DENSITY = 5

# --- PDF layout heuristics --------------------------------------------------
# A block spanning >= this fraction of the page content width is a
# full-width ("spanning") block: it segments the page into vertical bands
# (titles, abstracts above a 2-column body).
SPANNING_WIDTH_FRAC = 0.6

# Minimum horizontal white gap (pt) separating two columns.
COLUMN_GAP_PT = 10.0

# font_size >= body_size * this ⇒ heading.
HEADING_SIZE_RATIO = 1.2

# Maximum heading depth emitted.
MAX_HEADING_LEVEL = 6

# y/x rounding tolerance (pt) when binning table rows / columns.
TABLE_ALIGN_TOL = 5.0

# Max vertical gap (pt) between consecutive table rows: grids are dense;
# 2-column *text* layouts also align on x but their blocks sit far apart
# vertically, so adjacency separates tables from columns.
ROW_GAP_MAX_PT = 15.0

# Caption detection: a block directly below a figure whose text starts with
# one of these prefixes becomes a caption span (golden md lines 105-107:
# an image ref followed by a bold "**Figure N** …" line).
CAPTION_PREFIXES = ("fig.", "figure", "table", "tab.")
# Max vertical gap (pt) between figure bottom and caption top.
CAPTION_MAX_GAP_PT = 30.0
