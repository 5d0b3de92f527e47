"""Generate the real-decode media goldens the driver oracles read.

- ``goldens/media_features_real.parquet`` — expected decode features for
  the deterministic BMP/JPEG/corrupt payload population of
  ``__spark_entry__.q_media_features_real``
- ``goldens/frame_counts_real.parquet``   — expected per-doc frame
  aggregates for ``q_frame_counts_real``'s AVI/corrupt population

Computed PURE PYTHON (no Spark): the same payload producers and codecs
the Arrow UDFs call, over the same fixed id ranges — the
``extract_files.parquet`` golden pattern.  The codecs themselves are
verified against independent ground truth in tests/test_jpeg_kernel.py
and tests/test_docx_properties.py (closed-form DC cases, source-pixel
round-trip bounds), so the goldens pin real decodes, not a tautology.

Regenerate (and commit together) whenever kernels/jpeg.py,
operators/multimodal.py payload producers, or the feature formulas
change:

    python tools/make_media_goldens.py
"""

from __future__ import annotations

import math
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.operators.multimodal import (  # noqa: E402
    avi_payload,
    bmp_payload,
    animated_gif_payload,
    corrupt_avi_payload,
    corrupt_image_payload,
    decode_frames_auto,
    decode_image_auto,
    gif_payload,
    jpeg_payload,
    png_payload,
    tiff_payload,
)

GOLDENS = os.path.join(REPO, "goldens")

# id-range → producer map; MUST mirror q_media_features_real /
# q_frame_counts_real in __spark_entry__.py
MEDIA_RANGES = [
    (range(0, 40), "img_{nid}.bmp", bmp_payload),
    (range(40, 80), "img_{nid}.jpg", lambda n: jpeg_payload(n)),
    (range(80, 100), "img_{nid}.jpg",
     lambda n: jpeg_payload(n, quality=85, subsample=True)),
    (range(100, 120), "img_{nid}.jpg", corrupt_image_payload),
    (range(120, 140), "img_{nid}.png", png_payload),
    (range(140, 160), "img_{nid}.gif", gif_payload),
    (range(160, 180), "img_{nid}.tif", tiff_payload),
]
FRAME_RANGES = [
    (range(0, 60), avi_payload),
    (range(60, 80), corrupt_avi_payload),
    (range(80, 100), animated_gif_payload),
]
FRAME_EVERY = 2


def media_features_rows() -> pd.DataFrame:
    rows = []
    for ids, ref_fmt, make in MEDIA_RANGES:
        for nid in ids:
            row = {"doc_id": str(nid), "media_ref": ref_fmt.format(nid=nid)}
            try:
                w, h, arr = decode_image_auto(make(nid))
                means = arr.reshape(-1, 3).mean(axis=0)
            except ValueError:
                row.update(decode_ok=False, width=None, height=None,
                           mean_r_e4=None, mean_g_e4=None, mean_b_e4=None,
                           brightness_millis=None)
                rows.append(row)
                continue
            # the UDF rounds means to 6 dp; the gated query floors *1e4 —
            # identical IEEE doubles on both sides, so mirror exactly
            r6 = [round(float(m), 6) for m in means]
            row.update(
                decode_ok=True, width=w, height=h,
                mean_r_e4=math.floor(r6[0] * 10000),
                mean_g_e4=math.floor(r6[1] * 10000),
                mean_b_e4=math.floor(r6[2] * 10000),
                brightness_millis=int(float(means.mean()) * 1000 / 255),
            )
            rows.append(row)
    df = pd.DataFrame(rows)
    for col, dt in (("width", "Int32"), ("height", "Int32"),
                    ("mean_r_e4", "Int64"), ("mean_g_e4", "Int64"),
                    ("mean_b_e4", "Int64"), ("brightness_millis", "Int64")):
        df[col] = df[col].astype(dt)
    return df


def frame_counts_rows() -> pd.DataFrame:
    rows = []
    for ids, make in FRAME_RANGES:
        for nid in ids:
            try:
                _, _, frames = decode_frames_auto(make(nid))
            except ValueError:
                rows.append({"doc_id": str(nid), "n_rows": 1, "n_decoded": 0,
                             "last_frame": None, "sum_brightness": None})
                continue
            sampled = list(range(0, len(frames), FRAME_EVERY))
            bright = [int(float(frames[i].mean()) * 1000 / 255)
                      for i in sampled]
            rows.append({
                "doc_id": str(nid), "n_rows": len(sampled),
                "n_decoded": len(sampled), "last_frame": sampled[-1],
                "sum_brightness": sum(bright),
            })
    df = pd.DataFrame(rows)
    df["n_rows"] = df["n_rows"].astype("Int64")
    df["n_decoded"] = df["n_decoded"].astype("Int64")
    df["last_frame"] = df["last_frame"].astype("Int32")
    df["sum_brightness"] = df["sum_brightness"].astype("Int64")
    return df


def main() -> None:
    media = media_features_rows()
    frames = frame_counts_rows()
    media.to_parquet(os.path.join(GOLDENS, "media_features_real.parquet"),
                     index=False)
    frames.to_parquet(os.path.join(GOLDENS, "frame_counts_real.parquet"),
                      index=False)
    print(f"media_features_real: {len(media)} rows "
          f"({int(media.decode_ok.sum())} decoded); "
          f"frame_counts_real: {len(frames)} rows")


if __name__ == "__main__":
    main()
