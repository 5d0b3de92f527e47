"""Pure pandas/python extraction kernels — no Spark imports.

These implement the computation the reference delegates to the Marker
library via ``rendered = self.converter(src_path)``
(reference ``converters/pdf_to_md.py:159``): HTML boilerplate stripping
and PDF layout parsing, emitting ordered markdown spans interleaved with
media references.
"""

from parserpdf_spark.kernels.extract import (  # noqa: F401
    extract_document,
    extract_document_safe,
)
