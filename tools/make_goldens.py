"""Regenerate golden extraction outputs (pure-pandas path, no Spark).

Goldens are the committed expected outputs of the extraction kernels on
the deterministic synthetic docs derived from the sandbox testdata
(sources/synth.py).  They version together with the kernels' frozen
heuristic constants (kernels/constants.py): change either → rerun this.

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.extract import extract_document_safe  # noqa: E402
from parserpdf_spark.sources.synth import synth_doc  # noqa: E402

SFS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}


def build_golden(sf_dir: str) -> pd.DataFrame:
    src = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    for nid, text in zip(src["doc_id"], src["text"]):
        spans, metrics = extract_document_safe(synth_doc(int(nid), text))
        assert metrics["status"] == "ok", (nid, metrics)
        for s in spans:
            rows["doc_id"].append(str(nid))
            rows["kind"].append(s["kind"])
            rows["text"].append(s["text"])
            rows["media_ref"].append(s["media_ref"])
            rows["offset"].append(s["offset"])
    out = pd.DataFrame(rows)
    out["offset"] = out["offset"].astype("int32")
    return out


def main() -> None:
    os.makedirs(os.path.join(REPO, "goldens"), exist_ok=True)
    for name, sf_dir in SFS.items():
        golden = build_golden(sf_dir)
        path = os.path.join(REPO, "goldens", f"extract_{name}.parquet")
        golden.to_parquet(path, index=False)
        print(f"{path}: {len(golden)} spans, "
              f"{golden['doc_id'].nunique()} docs")


if __name__ == "__main__":
    main()
